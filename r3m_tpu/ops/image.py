"""Device-side image preprocessing ops (NHWC, jit-friendly).

Replaces the reference's torchvision transform stack
(``/root/reference/r3m/models/models_r3m.py:58-61,84-98``: /255 ->
Resize(256)+CenterCrop(224) when the input isn't 224x224 -> Normalize)
with pure XLA ops that fuse into the encoder's first conv. All functions
take NHWC float input in [0, 255] unless noted.

Resize parity note: the reference pins torch 1.7.1, whose tensor-mode
``transforms.Resize`` is ``F.interpolate(mode="bilinear",
align_corners=False)`` with NO antialiasing; `jax.image.resize` with
``antialias=False`` implements the same half-pixel-center bilinear law, so
the two match to float rounding.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# ImageNet statistics (models_r3m.py:61); ViT uses 0.5/0.5 (models_r3m.py:59).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
VIT_MEAN = (0.5, 0.5, 0.5)
VIT_STD = (0.5, 0.5, 0.5)


def normalize(x: jax.Array, mean: Sequence[float], std: Sequence[float]) -> jax.Array:
    """Channel-wise (x - mean) / std over the last (C) axis; x in [0, 1]."""
    mean_a = jnp.asarray(mean, dtype=x.dtype)
    inv_std = 1.0 / jnp.asarray(std, dtype=x.dtype)
    return (x - mean_a) * inv_std


def resize_shorter_side(x: jax.Array, target: int = 256) -> jax.Array:
    """torchvision Resize(int): scale so the shorter side == target.

    Shapes are static under jit, so the output size is computed at trace
    time. Bilinear, no antialias (torch 1.7.1 tensor semantics). The long
    edge TRUNCATES — torchvision's functional.resize computes
    ``int(size * w / h)`` (0.8.x `_interpolate` sizing, unchanged since) —
    so e.g. 427x640 -> 256x383, NOT the round()ed 384; the off-by-one
    moves the bilinear grid and the CenterCrop window, which is visible
    in embedding parity for non-native input sizes.
    """
    b, h, w, c = x.shape
    if h <= w:
        nh, nw = target, max(1, int(w * target / h))
    else:
        nh, nw = max(1, int(h * target / w)), target
    return jax.image.resize(x, (b, nh, nw, c), method="bilinear", antialias=False)


def center_crop(x: jax.Array, size: int = 224) -> jax.Array:
    """torchvision CenterCrop(size); pads with zeros if the image is smaller."""
    b, h, w, c = x.shape
    if h < size or w < size:
        ph, pw = max(size - h, 0), max(size - w, 0)
        x = jnp.pad(
            x,
            (
                (0, 0),
                (ph // 2, ph - ph // 2),
                (pw // 2, pw - pw // 2),
                (0, 0),
            ),
        )
        b, h, w, c = x.shape
    top = (h - size) // 2
    left = (w - size) // 2
    return x[:, top : top + size, left : left + size, :]


def r3m_preprocess(
    obs: jax.Array,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    crop_size: int = 224,
    resize_to: int = 256,
) -> jax.Array:
    """Full reference preprocessing (models_r3m.py:84-98).

    `obs`: NHWC float in [0, 255]. If spatial dims != crop_size, applies
    Resize(resize_to) + CenterCrop(crop_size) first (matching the
    reference's shape-dependent transform selection), then scales to [0,1]
    and normalizes.
    """
    x = obs.astype(jnp.float32) / 255.0
    if obs.shape[1] != crop_size or obs.shape[2] != crop_size:
        x = resize_shorter_side(x, resize_to)
        x = center_crop(x, crop_size)
    return normalize(x, mean, std)


def nchw_to_nhwc(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 3, 1, 2))
