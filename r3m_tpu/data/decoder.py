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


def _load_library(auto_build: bool = True):
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
    return lib


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
        assert out.shape == (n, self.height, self.width, 3) and out.dtype == np.uint8
        if self._handle is not None:
            arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
            self._lib.r3m_decode_batch(
                self._handle,
                arr,
                n,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                self.height,
                self.width,
            )
            return out
        return self._decode_batch_pil(paths, out)

    def _decode_batch_pil(self, paths: Sequence[str], out: np.ndarray) -> np.ndarray:
        from PIL import Image

        for i, p in enumerate(paths):
            try:
                with Image.open(p) as im:
                    im = im.convert("RGB")
                    if im.size != (self.width, self.height):
                        im = im.resize((self.width, self.height), Image.BOX)
                    out[i] = np.asarray(im)
            except Exception:
                out[i] = 0
        return out

    def __del__(self):
        if getattr(self, "_handle", None) is not None and self._lib is not None:
            self._lib.r3m_decoder_destroy(self._handle)
            self._handle = None
