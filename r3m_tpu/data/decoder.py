"""Batched JPEG decoding: ctypes binding to the native decode stage.

Wraps `csrc/jpeg_decoder.cpp` (libjpeg thread-pool decoder writing straight
into a reusable pinned host staging buffer). Replaces the reference's
torchvision.io.read_image-per-frame in forked DataLoader workers
(``/root/reference/r3m/utils/data_loaders.py:30-34``). Falls back to a
PIL-based decoder if the shared library isn't built (`make -C csrc`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libr3m_decoder.so")
_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")

_warned_batches = 0


def _warn_failed(failed: int, n: int, limit: int = 20) -> None:
    """Surface decode failures (zero-filled frames) — rate-limited.

    Failed frames are zero-filled rather than fatal (a single corrupt JPEG
    must not kill a week-long pretrain), but silence would hide bad
    manifests (e.g. `len` exceeding the real frame count), so every failing
    batch warns until the limit.
    """
    global _warned_batches
    if failed > 0 and _warned_batches < limit:
        _warned_batches += 1
        print(
            f"[decoder] {failed}/{n} frames failed to decode (zero-filled) "
            f"— check manifest lengths / JPEG integrity"
            + (" [further warnings suppressed]" if _warned_batches == limit else "")
        )


_lib_memo: List = []  # [lib-or-None] once an auto-build load was attempted


def _load_library(auto_build: bool = True):
    # memoize the default path: a missing compiler/libjpeg otherwise re-runs
    # the failing `make` subprocess for every decoder/pipeline construction
    if auto_build and _lib_memo:
        return _lib_memo[0]
    lib = _load_library_uncached(auto_build)
    if auto_build:
        _lib_memo.append(lib)
    return lib


def _load_library_uncached(auto_build: bool = True):
    if not os.path.exists(_LIB_PATH) and auto_build and os.path.isdir(_SRC_DIR):
        try:
            subprocess.run(
                ["make", "-C", _SRC_DIR], check=True, capture_output=True
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.r3m_decoder_create.restype = ctypes.c_void_p
    lib.r3m_decoder_create.argtypes = [ctypes.c_int]
    lib.r3m_decoder_destroy.argtypes = [ctypes.c_void_p]
    lib.r3m_decode_batch.restype = ctypes.c_int
    lib.r3m_decode_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
    ]
    if hasattr(lib, "r3m_pipeline_create"):
        lib.r3m_pipeline_create.restype = ctypes.c_void_p
        lib.r3m_pipeline_create.argtypes = [ctypes.c_int] * 5
        lib.r3m_pipeline_destroy.argtypes = [ctypes.c_void_p]
        lib.r3m_pipeline_submit.restype = ctypes.c_int
        lib.r3m_pipeline_submit.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
        ]
        lib.r3m_pipeline_fetch.restype = ctypes.c_int
        lib.r3m_pipeline_fetch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
        ]
    return lib


# The reference samples 5 frames per clip (start, end, s0, s1, s2 —
# data_loaders.py:75-79); batch layouts everywhere are [B, 5, H, W, 3].
FRAMES_PER_CLIP = 5


class JpegDecoder:
    """Decode batches of JPEG paths into [N, H, W, 3] uint8 arrays."""

    def __init__(self, height: int = 224, width: int = 224, n_threads: Optional[int] = None):
        self.height = height
        self.width = width
        if n_threads is None:
            n_threads = max(1, (os.cpu_count() or 1))
        self._lib = _load_library()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.r3m_decoder_create(n_threads)

    @property
    def native(self) -> bool:
        return self._handle is not None

    def decode_batch(
        self, paths: Sequence[str], out: Optional[np.ndarray] = None
    ) -> np.ndarray:
        n = len(paths)
        if out is None:
            out = np.empty((n, self.height, self.width, 3), dtype=np.uint8)
        # explicit raises (NOT assert — stripped under `python -O`, after
        # which a wrong buffer becomes a native heap-overflow write); the
        # native path writes row-major, so the buffer must be C-contiguous
        if out.shape != (n, self.height, self.width, 3) or out.dtype != np.uint8:
            raise ValueError(
                f"out must be uint8 {(n, self.height, self.width, 3)}, "
                f"got {out.dtype} {out.shape}"
            )
        if not out.flags["C_CONTIGUOUS"]:
            raise ValueError("out must be C-contiguous")
        if self._handle is not None:
            arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
            failed = self._lib.r3m_decode_batch(
                self._handle,
                arr,
                n,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                self.height,
                self.width,
            )
            _warn_failed(failed, n)
            return out
        return self._decode_batch_pil(paths, out)

    def _decode_batch_pil(self, paths: Sequence[str], out: np.ndarray) -> np.ndarray:
        from PIL import Image

        failed = 0
        for i, p in enumerate(paths):
            try:
                with Image.open(p) as im:
                    im = im.convert("RGB")
                    if im.size != (self.width, self.height):
                        im = im.resize((self.width, self.height), Image.BOX)
                    out[i] = np.asarray(im)
            except Exception:
                out[i] = 0
                failed += 1
        _warn_failed(failed, len(paths))
        return out

    def __del__(self):
        if getattr(self, "_handle", None) is not None and self._lib is not None:
            self._lib.r3m_decoder_destroy(self._handle)
            self._handle = None


class NativeFramePipeline:
    """Fully native prefetch pipeline: C++ owns decode + batch assembly.

    Drop-in for `r3m_tpu.data.ego4d.FrameBatcher` (same `next_batch()`
    surface): `depth` batches of frame paths are submitted ahead; a C++
    thread pool decodes them concurrently into a staging-buffer ring, and
    `next_batch()` copies out the next completed batch in submit order —
    zero Python-thread involvement between submit and fetch. Captions ride
    a host-side queue parallel to the sequence order.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        height: int = 224,
        width: int = 224,
        n_threads: Optional[int] = None,
        depth: int = 3,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.height, self.width = height, width
        if n_threads is None:
            n_threads = max(1, (os.cpu_count() or 1))
        lib = _load_library()
        if lib is None or not hasattr(lib, "r3m_pipeline_create"):
            raise RuntimeError(
                "native pipeline unavailable — build with `make -C csrc`"
            )
        self._lib = lib
        self._frames = batch_size * FRAMES_PER_CLIP
        self._handle = lib.r3m_pipeline_create(
            n_threads, self._frames, height, width, depth
        )
        if not self._handle:  # C side refuses degenerate dimensions
            raise ValueError(
                f"invalid pipeline dims: batch_size={batch_size}, "
                f"height={height}, width={width}"
            )
        self._captions: "list[List[str]]" = []
        for _ in range(depth):
            self._submit_one()

    def _submit_one(self):
        if self._handle is None:
            # a NULL handle passed to C would be dereferenced -> SIGSEGV
            raise RuntimeError("pipeline is closed")
        paths, captions = self.dataset.sample_batch(self.batch_size)
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        rc = self._lib.r3m_pipeline_submit(self._handle, arr, len(paths))
        if rc != 0:
            raise RuntimeError(f"pipeline submit failed (rc={rc})")
        self._captions.append(captions)

    def next_batch(self):
        """-> ([B, 5, H, W, 3] uint8, captions). Blocks on the C++ ring.

        The C++ fetch copies the ring slot into a FRESH caller-owned array
        (a reused staging buffer would alias batches the prefetch queue is
        still holding, forcing a second defensive copy downstream)."""
        if self._handle is None:
            raise RuntimeError("pipeline is closed")
        buf = np.empty((self._frames, self.height, self.width, 3), np.uint8)
        failed = self._lib.r3m_pipeline_fetch(
            self._handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        if failed < 0:
            raise RuntimeError("pipeline fetch with nothing in flight")
        _warn_failed(failed, self._frames)
        captions = self._captions.pop(0)
        clips = buf.reshape(
            self.batch_size, FRAMES_PER_CLIP, self.height, self.width, 3
        )
        self._submit_one()  # keep the ring full
        return clips, captions

    def close(self):
        if getattr(self, "_handle", None) is not None:
            self._lib.r3m_pipeline_destroy(self._handle)
            self._handle = None

    def __del__(self):
        self.close()
