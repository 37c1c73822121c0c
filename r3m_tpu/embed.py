"""Batch embedding extraction: image files -> one .npz of R3M embeddings.

Downstream users of the reference loop `load_r3m(...)` over demonstration
frames one image at a time (``/root/reference/r3m/example.py:19-34`` is
the template they copy). This CLI is the production version of that loop:
collect image files, run fixed-size batches through ONE jitted encoder
forward (padding the tail batch so a single compiled program serves the
whole job), and write ``{embeddings [N, D] f32, paths [N] str}`` to an
``.npz`` for BC / reward probing.

    python -m r3m_tpu.embed --snapshot snap.npz --out emb.npz frames/
    python -m r3m_tpu.embed --model resnet50   --out emb.npz a.jpg b.jpg
"""

from __future__ import annotations

import argparse
import os
from typing import List, Sequence

import numpy as np

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def collect_image_files(inputs: Sequence[str]) -> List[str]:
    """Expand files/directories (recursive) into a sorted image-file list."""
    out: List[str] = []
    for item in inputs:
        if os.path.isdir(item):
            for root, _, names in os.walk(item):
                out.extend(
                    os.path.join(root, n)
                    for n in names
                    if n.lower().endswith(IMAGE_EXTS)
                )
        elif item.lower().endswith(IMAGE_EXTS):
            out.append(item)
        else:
            raise ValueError(f"not an image file or directory: {item}")
    if not out:
        raise ValueError("no image files found")
    return sorted(set(out))  # overlapping inputs must not duplicate rows


def _load_images(paths: Sequence[str], size: int) -> np.ndarray:
    """Load + Resize(256/224-scaled)+CenterCrop(size), NCHW uint8-range f32.

    Host-side equivalent of the example script's preprocessing
    (example.py:21-27); the tensor is handed to the encoder in [0, 255].
    """
    from PIL import Image

    resize = max(1, round(size * 256 / 224))
    out = np.empty((len(paths), 3, size, size), np.float32)
    for i, p in enumerate(paths):
        with Image.open(p) as im:
            im = im.convert("RGB")
            w, h = im.size
            scale = resize / min(w, h)
            im = im.resize(
                (max(1, round(w * scale)), max(1, round(h * scale))),
                Image.BILINEAR,
            )
            w, h = im.size
            left, top = (w - size) // 2, (h - size) // 2
            im = im.crop((left, top, left + size, top + size))
            out[i] = np.asarray(im, np.float32).transpose(2, 0, 1)
    return out


def load_encoder(args):
    mesh = None
    if getattr(args, "n_devices", 0):
        # data-parallel serving mesh: weights replicate, batches shard on
        # axis 0 (multi-chip throughput for large embedding jobs)
        from r3m_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.n_devices)
    precision = getattr(args, "precision", "parity")
    if args.snapshot:
        from r3m_tpu import load_r3m_from_snapshot

        return load_r3m_from_snapshot(
            args.snapshot, mesh=mesh, precision=precision
        )
    if args.model_file:
        from r3m_tpu import load_r3m_from_files

        return load_r3m_from_files(
            args.model_file, args.config_file or None, mesh=mesh,
            precision=precision,
        )
    from r3m_tpu import load_r3m

    return load_r3m(args.model, mesh=mesh, precision=precision)


def main(argv=None) -> str:
    from r3m_tpu.utils.misc import honor_jax_platforms_env

    honor_jax_platforms_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("inputs", nargs="+", help="image files and/or directories")
    p.add_argument("--out", required=True, help="output .npz path")
    src = p.add_mutually_exclusive_group()
    src.add_argument("--model", default="resnet50",
                     help="pretrained registry id (resnet18/34/50)")
    src.add_argument("--snapshot", default="",
                     help="native training snapshot (.npz)")
    src.add_argument("--model-file", default="",
                     help="reference torch model.pt / snapshot.pt")
    p.add_argument("--config-file", default="",
                   help="config.yaml next to --model-file (optional)")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--n-devices", type=int, default=0,
                   help="shard each batch over an N-device data-parallel "
                   "mesh (0 = single device)")
    p.add_argument("--precision", choices=("parity", "fast"), default="parity",
                   help="parity = f32/HIGHEST (the load_r3m law); fast = "
                   "bf16 folded serving, ~4x device rate at cosine "
                   ">=0.9999 vs parity (BASELINE.md)")
    args = p.parse_args(argv)

    files = collect_image_files(args.inputs)
    enc = load_encoder(args)
    size = enc.cfg.image_size
    if args.n_devices:
        # every (padded) batch must split evenly across the mesh
        args.batch = -(-max(1, args.batch) // args.n_devices) * args.n_devices

    from r3m_tpu.utils.misc import pad_batch

    chunks = []
    bs = max(1, args.batch)
    for i in range(0, len(files), bs):
        # streamed from disk chunk-by-chunk (unlike evalsuite's in-memory
        # _embed_chunked); tail padded so one program shape serves the job
        imgs = _load_images(files[i : i + bs], size)
        n = imgs.shape[0]
        chunks.append(np.asarray(enc(pad_batch(imgs, bs)))[:n])
        print(f"embedded {min(i + bs, len(files))}/{len(files)}")
    emb = np.concatenate(chunks).astype(np.float32)

    tmp = args.out + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, embeddings=emb, paths=np.asarray(files))
    os.replace(tmp, args.out)
    print(f"wrote {emb.shape[0]} x {emb.shape[1]} embeddings -> {args.out}")
    return args.out


def cli(argv=None) -> int:
    """Console-script entry: `sys.exit(cli())` must be 0 on success (main()
    returns the output path, which sys.exit would treat as failure)."""
    main(argv)
    return 0


if __name__ == "__main__":
    main()
