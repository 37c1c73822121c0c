"""Ego4D clip dataset: manifest, frame-index sampling law, batch assembly.

Mirrors the reference's `R3MBuffer` sampling semantics
(``/root/reference/r3m/utils/data_loaders.py:38-109``) without the torch
DataLoader machinery:

* manifest.csv columns ``path`` (frame dir), ``len`` (frame count),
  ``txt`` (narration; the leading ``"C "`` is stripped via txt[2:]);
* per-sample index law (data_loaders.py:75-79), frames are 1-based files
  ``{path}/{index:06}.jpg``:
      start  ~ U[1, 2 + int(alpha*len))
      end    ~ U[int((1-alpha)*len) - 1, len)
      s1     ~ U[2, len)
      s0     ~ U[1, s1)
      s2     ~ U[s1, len + 1)
* a batch is ([B, 5, H, W, 3] uint8 frames in order
  (start, end, s0, s1, s2), captions) — the (e0, eg, es0, es1, es2)
  order the loss engine expects.

Decoding runs through the native batched JPEG stage (decoder.py); the
random-resized-crop augmentation happens on DEVICE (augment.py), so the
host path is just sample->decode->stack.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from r3m_tpu.data.decoder import FRAMES_PER_CLIP, JpegDecoder


@dataclasses.dataclass
class ClipSample:
    paths: List[str]  # 5 frame file paths
    caption: str


class Ego4DDataset:
    """Manifest-backed clip sampler (host side, pure numpy RNG)."""

    def __init__(
        self,
        datapath: str,
        alpha: float = 0.2,
        seed: int = 0,
        manifest: Optional[pd.DataFrame] = None,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        if manifest is None:
            manifest = pd.read_csv(os.path.join(datapath, "manifest.csv"))
        bad = manifest[manifest["len"] < 3]
        if len(bad):
            # the index law (s1 ~ U[2, len)) needs len >= 3; the reference
            # crashes mid-training on such rows — fail fast at load instead.
            # Validate BEFORE host sharding so every process of a multi-host
            # job fails identically (a single failing shard would leave the
            # others hung in their first collective).
            raise ValueError(
                f"manifest rows with len < 3 cannot be sampled: "
                f"{bad['path'].tolist()[:5]}{'...' if len(bad) > 5 else ''}"
            )
        if num_shards > 1:
            # host-level sharding for multi-process (multi-host) input.
            # Checked pre-shard (it's the same predicate on every process):
            # a shard with zero rows would crash only the starved hosts'
            # producer threads while the rest hang in their first collective.
            if len(manifest) < num_shards:
                raise ValueError(
                    f"manifest has {len(manifest)} rows but num_shards="
                    f"{num_shards}: every host shard needs at least one clip"
                )
            manifest = manifest.iloc[shard_index::num_shards].reset_index(drop=True)
        self.manifest = manifest
        self.alpha = alpha
        self._seed = seed
        self.rng = np.random.default_rng(seed)
        self._paths = manifest["path"].to_numpy()
        self._lens = manifest["len"].to_numpy()
        self._txts = manifest["txt"].to_numpy()

    def __len__(self) -> int:
        return len(self.manifest)

    def stream_fingerprint(self) -> str:
        """Identity of the draw sequence this dataset's RNG produces.

        `skip_batches` replays draws whose BOUNDS come from the manifest's
        lens (and alpha, and the seeded RNG) — fast-forwarding against a
        different manifest consumes a different bitstream, so the resumed
        stream matches neither the interrupted run nor a fresh one while
        claiming bit-reproducibility (review finding). The workspace
        stores this in snapshot metadata and only transfers stream
        counters when it matches.
        """
        import hashlib

        h = hashlib.sha1()
        h.update(f"alpha={self.alpha};seed={self._seed};".encode())
        h.update(";".join(map(str, self._paths)).encode())
        h.update(b"|")
        h.update(";".join(map(str, self._lens)).encode())
        return h.hexdigest()[:16]

    def sample_indices(self, vidlen: int) -> Tuple[int, int, int, int, int]:
        """The exact index law of data_loaders.py:75-79 (1-based frames)."""
        rng = self.rng
        start_ind = int(rng.integers(1, 2 + int(self.alpha * vidlen)))
        end_ind = int(rng.integers(max(int((1 - self.alpha) * vidlen) - 1, 1), vidlen))
        s1_ind = int(rng.integers(2, vidlen))
        s0_ind = int(rng.integers(1, s1_ind))
        s2_ind = int(rng.integers(s1_ind, vidlen + 1))
        return start_ind, end_ind, s0_ind, s1_ind, s2_ind

    def sample_clip(self) -> ClipSample:
        vidid = int(self.rng.integers(0, len(self._paths)))
        vidlen = int(self._lens[vidid])
        raw = self._txts[vidid]
        # a missing txt cell reads back as float NaN; str(NaN)[2:] would
        # yield the junk caption "n" with lang_mask=1 — treat as empty
        txt = "" if pd.isna(raw) else str(raw)
        caption = txt[2:]  # strips the leading "C " (data_loaders.py:72)
        vid = str(self._paths[vidid])
        inds = self.sample_indices(vidlen)
        return ClipSample(
            paths=[os.path.join(vid, f"{i:06}.jpg") for i in inds],
            caption=caption,
        )

    def skip_batches(self, n_batches: int, batch_size: int) -> None:
        """Fast-forward the RNG as if `n_batches` had already been drawn.

        Reproducible resume: a resumed run replays the draw sequence the
        interrupted run consumed, so it continues on the exact batch stream
        an uninterrupted run would have produced (the reference re-seeds
        its DataLoader workers on restart and silently changes the stream).
        Consumption mirrors `sample_clip` draw-for-draw — one video-id draw
        plus the five index draws (whose bounds depend on the drawn video,
        so the replay must follow the real manifest). Pure host RNG work:
        ~1M clip draws per second (no paths, no decode).
        """
        for _ in range(n_batches * batch_size):
            vidid = int(self.rng.integers(0, len(self._paths)))
            self.sample_indices(int(self._lens[vidid]))

    def sample_batch(self, batch_size: int) -> Tuple[List[str], List[str]]:
        """Returns (5*B flat frame paths, B captions)."""
        paths: List[str] = []
        captions: List[str] = []
        for _ in range(batch_size):
            c = self.sample_clip()
            paths.extend(c.paths)
            captions.append(c.caption)
        return paths, captions


class FrameBatcher:
    """sample -> decode -> [B, 5, H, W, 3] uint8 batch assembly.

    Each call decodes into a FRESH array the caller owns outright — a
    reused staging buffer would hand out aliases that the next call
    silently overwrites (the prefetch queue holds batches across calls),
    forcing every consumer to pay a defensive full-batch copy anyway.
    """

    def __init__(
        self,
        dataset: Ego4DDataset,
        batch_size: int,
        height: int = 224,
        width: int = 224,
        n_threads: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.decoder = JpegDecoder(height, width, n_threads)

    def next_batch(self) -> Tuple[np.ndarray, List[str]]:
        paths, captions = self.dataset.sample_batch(self.batch_size)
        frames = self.decoder.decode_batch(paths)
        clips = frames.reshape(
            self.batch_size, FRAMES_PER_CLIP, *frames.shape[1:]
        )
        return clips, captions


def write_synthetic_dataset(
    root: str,
    n_videos: int = 8,
    min_len: int = 12,
    max_len: int = 40,
    size: int = 224,
    seed: int = 0,
    captions: Optional[Sequence[str]] = None,
) -> str:
    """Generate a synthetic Ego4D-layout fixture (manifest.csv + JPEG frames).

    Used by tests and benchmarks; frame content is a smooth moving gradient
    so JPEG compresses fast and crops remain distinguishable.
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    rows = []
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for v in range(n_videos):
        vlen = int(rng.integers(min_len, max_len + 1))
        vdir = os.path.join(root, f"vid{v:03}")
        os.makedirs(vdir, exist_ok=True)
        phase = rng.uniform(0, 2 * np.pi)
        for t in range(1, vlen + 1):
            shift = t / vlen
            img = np.stack(
                [
                    127 + 120 * np.sin(2 * np.pi * (xx + shift) + phase),
                    127 + 120 * np.cos(2 * np.pi * (yy - shift) + phase),
                    127 + 120 * np.sin(2 * np.pi * (xx + yy + shift)),
                ],
                axis=-1,
            ).clip(0, 255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(vdir, f"{t:06}.jpg"), quality=85
            )
        cap = (
            captions[v % len(captions)]
            if captions
            else f"C person moves object {v}"
        )
        # the txt column is consumed via txt[2:] (the Ego4D "C " narrator
        # prefix strip, data_loaders.py:72) — ensure the prefix exists so a
        # caller's caption survives the strip intact
        if not cap.startswith("C "):
            cap = "C " + cap
        rows.append({"path": vdir, "len": vlen, "txt": cap})
    pd.DataFrame(rows).to_csv(os.path.join(root, "manifest.csv"), index=False)
    return root
