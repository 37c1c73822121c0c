"""Device-side RandomResizedCrop augmentation (rc / rctraj modes).

TPU-native replacement for the reference's host-side torchvision
``RandomResizedCrop(224, scale=(0.2, 1.0))``
(``/root/reference/r3m/utils/data_loaders.py:47-52,81-102``): the crop
parameter law is torchvision's `get_params` (10 rejection-sampling
attempts over area scale U(0.2,1.0) and log-uniform aspect ratio 3/4..4/3,
then a ratio-clamped center-crop fallback), and the crop+resize runs as a
traced `jax.image.scale_and_translate` — a fixed-shape bilinear gather XLA
fuses with the normalization into the encoder's input stage, instead of
per-sample PIL work in DataLoader processes.

Modes (data_loaders.py:81-102):
  * ``rctraj`` — ONE crop drawn per clip, applied identically to all 5
    frames (trajectory-consistent);
  * ``rc`` — an independent crop per frame;
  * ``none`` — identity.

Because the crop rectangle is data-independent, sampling params and the
resize are fully vectorized: `vmap` over clips (and frames for ``rc``)
with a per-sample PRNG key. No antialias, matching torch 1.7.1 tensor-mode
interpolation.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ATTEMPTS = 10  # torchvision RandomResizedCrop.get_params
LOG_RATIO = (float(np.log(3.0 / 4.0)), float(np.log(4.0 / 3.0)))


def _check_norm_pair(mean, std) -> None:
    if (mean is None) != (std is None):
        raise ValueError(
            "mean and std must be given together (got only one); the "
            "normalized-output form needs both"
        )


def sample_crop_params(
    key: jax.Array,
    height: int,
    width: int,
    scale: Tuple[float, float] = (0.2, 1.0),
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Draw (i, j, h, w) via torchvision's law. All outputs are f32 scalars.

    Vectorized rejection sampling: draw all 10 attempts at once, take the
    first valid one (argmax of the validity mask), else the center-crop
    fallback with aspect-ratio clamping.
    """
    area = float(height * width)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    target_area = area * jax.random.uniform(
        k1, (ATTEMPTS,), minval=scale[0], maxval=scale[1]
    )
    aspect = jnp.exp(
        jax.random.uniform(k2, (ATTEMPTS,), minval=LOG_RATIO[0], maxval=LOG_RATIO[1])
    )
    w = jnp.round(jnp.sqrt(target_area * aspect))
    h = jnp.round(jnp.sqrt(target_area / aspect))
    valid = (w > 0) & (w <= width) & (h > 0) & (h <= height)
    idx = jnp.argmax(valid)  # first True (argmax returns first max)
    any_valid = jnp.any(valid)
    h_sel, w_sel = h[idx], w[idx]
    # uniform integer offsets in [0, H-h] / [0, W-w]
    u_i = jax.random.uniform(k3, ())
    u_j = jax.random.uniform(k4, ())
    i_sel = jnp.floor(u_i * (height - h_sel + 1))
    j_sel = jnp.floor(u_j * (width - w_sel + 1))

    # fallback: clamp aspect, center crop (torchvision get_params fallback)
    in_ratio = width / height
    min_r, max_r = np.exp(LOG_RATIO[0]), np.exp(LOG_RATIO[1])
    if in_ratio < min_r:
        fw, fh = float(width), float(round(width / min_r))
    elif in_ratio > max_r:
        fh, fw = float(height), float(round(height * max_r))
    else:
        fw, fh = float(width), float(height)
    fi, fj = float((height - fh) // 2), float((width - fw) // 2)

    i = jnp.where(any_valid, i_sel, fi)
    j = jnp.where(any_valid, j_sel, fj)
    hh = jnp.where(any_valid, h_sel, fh)
    ww = jnp.where(any_valid, w_sel, fw)
    return i, j, hh, ww


def resized_crop(
    img: jax.Array, i: jax.Array, j: jax.Array, h: jax.Array, w: jax.Array,
    out_size: int,
    compute_dtype=jnp.float32,
    mean: Optional[Tuple[float, ...]] = None,
    std: Optional[Tuple[float, ...]] = None,
) -> jax.Array:
    """Crop [i:i+h, j:j+w] and bilinear-resize to (out_size, out_size).

    Half-pixel-center sampling (align_corners=False, no antialias): output
    pixel o samples the CROP at (o + 0.5) * h/out - 0.5, with coordinates
    clamped to the crop rectangle — torch crops first, so its interpolation
    edge-clamps at the crop border; a naive scale_and_translate over the
    full image instead bleeds pixels from OUTSIDE the crop into the output
    border whenever the crop is upscaled (the common case under
    scale=(0.2, 1.0)). Traced crop params, static shapes: implemented as a
    row gather + column gather with bilinear weights.

    `compute_dtype` runs the tent-weight contractions in that dtype
    (bfloat16 halves the HBM bytes of the full-res streaming stage; uint8
    pixel values are exact in bfloat16 and the TPU MXU accumulates f32).
    When `mean`/`std` are given, the /255 rescale is folded into the row
    weights and the output is channel-normalized ((x/255 - mean)/std) in
    `compute_dtype` — the encoder-input form, skipping a separate
    normalize pass over the full frame (models_r3m.py:58-61).
    """
    _check_norm_pair(mean, std)
    img = img.astype(compute_dtype)
    hi, wi = img.shape[0], img.shape[1]
    o = jnp.arange(out_size, dtype=jnp.float32) + 0.5
    # sample positions: crop coordinates clamped inside the crop, then
    # shifted into image coordinates (y stays in [i, i+h-1])
    y = jnp.clip(o * (h / out_size) - 0.5, 0.0, h - 1.0) + i
    x = jnp.clip(o * (w / out_size) - 0.5, 0.0, w - 1.0) + j
    # dense bilinear tent-weight matrices: the 2-tap support around a
    # clamped position cannot leave the crop, and the contraction is MXU
    # matmul work (a sparse gather formulation measured ~12% slower
    # end-to-end on v5e)
    wy = jnp.maximum(
        0.0, 1.0 - jnp.abs(jnp.arange(hi, dtype=jnp.float32)[None, :] - y[:, None])
    )  # [out, H]
    wx = jnp.maximum(
        0.0, 1.0 - jnp.abs(jnp.arange(wi, dtype=jnp.float32)[None, :] - x[:, None])
    )  # [out, W]
    if mean is not None:
        wy = wy * (1.0 / 255.0)  # fold the 0-255 -> 0-1 rescale into the weights
    rows = jnp.einsum("oh,hwc->owc", wy.astype(compute_dtype), img)
    out = jnp.einsum("pw,owc->opc", wx.astype(compute_dtype), rows)
    if mean is not None:
        m = jnp.asarray(mean, dtype=compute_dtype)
        inv = jnp.asarray([1.0 / s for s in std], dtype=compute_dtype)
        out = (out - m) * inv
    return out


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "mode", "scale", "compute_dtype", "mean", "std"),
)
def random_resized_crop_clips(
    key: jax.Array,
    clips: jax.Array,
    out_size: int = 224,
    mode: str = "rctraj",
    scale: Tuple[float, float] = (0.2, 1.0),
    compute_dtype=jnp.float32,
    mean: Optional[Tuple[float, ...]] = None,
    std: Optional[Tuple[float, ...]] = None,
) -> jax.Array:
    """Augment [B, F, H, W, C] clip tuples -> [B, F, out, out, C].

    ``rctraj``: one crop per clip shared by its F frames. ``rc``: an
    independent crop per frame. ``none``: identity resize-free passthrough
    (requires H == W == out_size).

    Default output: `compute_dtype` values in [0, 255] (float32 = the
    round-1 contract). With `mean`/`std` set, the output is instead the
    normalized encoder-input form ((x/255 - mean)/std) with the rescale
    folded into the crop weights — see `resized_crop`.
    """
    _check_norm_pair(mean, std)
    b, f, hgt, wid, c = clips.shape
    if mode not in ("rc", "rctraj", "none"):
        # a typo must not silently disable augmentation (mirrors the
        # trainer-level guard, training/trainer.py)
        raise ValueError(f"mode must be 'rc'|'rctraj'|'none', got {mode!r}")
    if mode == "none":
        if hgt != out_size or wid != out_size:
            raise ValueError("mode='none' needs pre-sized frames")
        x = clips.astype(compute_dtype)
        if mean is not None:
            m = jnp.asarray(mean, dtype=compute_dtype)
            inv = jnp.asarray([1.0 / (255.0 * s) for s in std], dtype=compute_dtype)
            x = (x - 255.0 * m) * inv
        return x

    crop = functools.partial(
        resized_crop, compute_dtype=compute_dtype, mean=mean, std=std
    )
    if mode == "rctraj":
        keys = jax.random.split(key, b)

        def one_clip(k, clip):
            i, j, h, w = sample_crop_params(k, hgt, wid, scale)
            return jax.vmap(lambda im: crop(im, i, j, h, w, out_size))(clip)

        return jax.vmap(one_clip)(keys, clips)

    keys = jax.random.split(key, b * f).reshape(b, f, -1)

    def one_frame(k, im):
        i, j, h, w = sample_crop_params(k, hgt, wid, scale)
        return crop(im, i, j, h, w, out_size)

    return jax.vmap(jax.vmap(one_frame))(keys, clips)
