"""Device-side RandomResizedCrop: resize numerics vs torch, param law stats."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from r3m_tpu.data.augment import (
    random_resized_crop_clips,
    resized_crop,
    sample_crop_params,
)


def test_resized_crop_matches_torch_interpolate(rng):
    """crop+bilinear resize == torch F.interpolate(align_corners=False) on the crop."""
    img = rng.uniform(0, 255, size=(64, 80, 3)).astype(np.float32)
    i, j, h, w = 7, 11, 40, 53
    ref = (
        torch.nn.functional.interpolate(
            torch.from_numpy(img[i : i + h, j : j + w]).permute(2, 0, 1)[None],
            size=(32, 32),
            mode="bilinear",
            align_corners=False,
        )[0]
        .permute(1, 2, 0)
        .numpy()
    )
    ours = resized_crop(
        jnp.asarray(img), float(i), float(j), float(h), float(w), 32
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-3)


def test_crop_param_law():
    """Params respect torchvision's bounds: area in [0.2,1.0]*A (pre-round),
    aspect in [3/4,4/3] (pre-round), crop inside the image."""
    H = W = 224
    keys = jax.random.split(jax.random.PRNGKey(0), 500)
    ps = jax.vmap(lambda k: jnp.stack(sample_crop_params(k, H, W)))(keys)
    ps = np.asarray(ps)
    i, j, h, w = ps.T if ps.shape[1] != 4 else (ps[:, 0], ps[:, 1], ps[:, 2], ps[:, 3])
    assert np.all(i >= 0) and np.all(j >= 0)
    assert np.all(i + h <= H) and np.all(j + w <= W)
    area_frac = (h * w) / (H * W)
    # rounding slop on h,w: allow small tolerance around [0.2, 1.0]
    assert np.all(area_frac > 0.15) and np.all(area_frac <= 1.01)
    ratio = w / h
    assert np.all(ratio > 3 / 4 - 0.05) and np.all(ratio < 4 / 3 + 0.05)
    # decent spread (not collapsed to fallback)
    assert np.std(area_frac) > 0.1


def test_rctraj_is_trajectory_consistent(rng):
    """All 5 frames of a clip get the SAME crop: identical frames stay identical."""
    frame = rng.uniform(0, 255, size=(64, 64, 3)).astype(np.float32)
    clip = np.stack([frame] * 5)  # same image 5x
    out = random_resized_crop_clips(
        jax.random.PRNGKey(3), jnp.asarray(clip[None]), out_size=32, mode="rctraj"
    )
    out = np.asarray(out[0])
    for f in range(1, 5):
        np.testing.assert_array_equal(out[0], out[f])


def test_rc_is_independent(rng):
    frame = rng.uniform(0, 255, size=(64, 64, 3)).astype(np.float32)
    clip = np.stack([frame] * 5)
    out = np.asarray(
        random_resized_crop_clips(
            jax.random.PRNGKey(3), jnp.asarray(clip[None]), out_size=32, mode="rc"
        )[0]
    )
    diffs = [np.abs(out[0] - out[f]).max() for f in range(1, 5)]
    assert max(diffs) > 1.0  # at least one frame cropped differently


def test_none_mode_passthrough(rng):
    clip = rng.uniform(0, 255, size=(2, 5, 32, 32, 3)).astype(np.float32)
    out = random_resized_crop_clips(
        jax.random.PRNGKey(0), jnp.asarray(clip), out_size=32, mode="none"
    )
    np.testing.assert_array_equal(np.asarray(out), clip)


def test_resized_crop_upscale_matches_torch(rng):
    """UPSCALED crops (crop smaller than out) must edge-clamp at the crop
    border like torch's crop-then-interpolate — no pixel bleed from outside
    the crop rectangle."""
    img = rng.uniform(0, 255, size=(64, 80, 3)).astype(np.float32)
    for (i, j, h, w) in [(10, 20, 20, 20), (0, 0, 5, 7), (40, 60, 24, 20)]:
        ref = (
            torch.nn.functional.interpolate(
                torch.from_numpy(img[i : i + h, j : j + w]).permute(2, 0, 1)[None],
                size=(32, 32),
                mode="bilinear",
                align_corners=False,
            )[0]
            .permute(1, 2, 0)
            .numpy()
        )
        ours = resized_crop(
            jnp.asarray(img), float(i), float(j), float(h), float(w), 32
        )
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-3)


def test_fused_normalize_matches_composition(rng):
    """mean/std-fused crop output == crop -> /255 -> normalize (f32 exact-ish,
    bf16 within bf16 rounding of the normalized range)."""
    from r3m_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD, normalize

    clips = jnp.asarray(
        rng.uniform(0, 255, size=(2, 5, 48, 48, 3)).astype(np.float32)
    )
    key = jax.random.PRNGKey(11)
    ref = normalize(
        random_resized_crop_clips(key, clips, out_size=32) / 255.0,
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    fused = random_resized_crop_clips(
        key, clips, out_size=32, mean=IMAGENET_MEAN, std=IMAGENET_STD
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-4)

    fused_bf16 = random_resized_crop_clips(
        key,
        clips,
        out_size=32,
        compute_dtype=jnp.bfloat16,
        mean=IMAGENET_MEAN,
        std=IMAGENET_STD,
    )
    assert fused_bf16.dtype == jnp.bfloat16
    # normalized ImageNet range is ~[-2.1, 2.6]; bf16 tent weights give
    # ~0.4% relative error on the [0,1] pixel value -> <=0.1 absolute here
    np.testing.assert_allclose(
        np.asarray(fused_bf16, dtype=np.float32), np.asarray(ref), atol=0.1
    )


def test_fused_normalize_mode_none(rng):
    from r3m_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD, normalize

    clips = jnp.asarray(
        rng.uniform(0, 255, size=(2, 5, 32, 32, 3)).astype(np.float32)
    )
    key = jax.random.PRNGKey(0)
    ref = normalize(clips / 255.0, IMAGENET_MEAN, IMAGENET_STD)
    out = random_resized_crop_clips(
        key, clips, out_size=32, mode="none", mean=IMAGENET_MEAN, std=IMAGENET_STD
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_mean_without_std_rejected():
    import pytest

    from r3m_tpu.data.augment import random_resized_crop_clips

    clips = jnp.zeros((1, 2, 16, 16, 3))
    with pytest.raises(ValueError, match="together"):
        random_resized_crop_clips(
            jax.random.PRNGKey(0), clips, out_size=8, mean=(0.5, 0.5, 0.5)
        )


def test_resize_shorter_side_torchvision_sizing(rng):
    """The serving Resize(256) law truncates the long edge like torchvision.

    torchvision functional.resize (0.8.x sizing, unchanged since) computes
    the long edge as int(size * long / short) — truncation, not round().
    E.g. 427x640 -> 256x383 (round would give 384, shifting the bilinear
    grid and the CenterCrop window; regression found round()ing)."""
    from r3m_tpu.ops.image import resize_shorter_side

    cases = {
        (427, 640): (256, 383),
        (640, 427): (383, 256),
        (480, 640): (256, 341),
        (300, 500): (256, 426),
        (256, 256): (256, 256),
        (1, 10000): (256, 2560000),
    }
    for (h, w), (eh, ew) in cases.items():
        # geometry via eval_shape: no giant allocations for extreme ratios
        out = jax.eval_shape(
            resize_shorter_side,
            jax.ShapeDtypeStruct((1, h, w, 1), jnp.float32),
        )
        assert out.shape[1:3] == (eh, ew), ((h, w), out.shape)

    # and pixel-level parity with torch's bilinear (align_corners=False,
    # no antialias — the 1.7.1 tensor path) on one non-native geometry
    x = rng.uniform(0, 1, size=(1, 120, 97, 3)).astype(np.float32)
    ours = np.asarray(resize_shorter_side(jnp.asarray(x), 64))
    ref = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=(int(64 * 120 / 97), 64),
            mode="bilinear",
            align_corners=False,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
