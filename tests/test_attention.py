"""Fused Pallas attention vs the einsum reference (interpret mode on CPU).

The kernel (`r3m_tpu.ops.attention.fused_attention`) is the ViT-B/32
candidate from the round-2 per-op plan: keep the [B, H, T, T] scores in
VMEM and recompute probs in the VJP. These tests pin forward AND gradient
numerics against the exact einsum path `vit_b32_apply` uses; whether the
kernel is wired by default is a real-chip measurement (BASELINE.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from r3m_tpu.ops.attention import fused_attention


def _ref_attention(q, k, v, n_heads):
    """The einsum path from models/vit.py, packed-layout in/out."""
    b, t, hd = q.shape
    d = hd // n_heads
    qh = q.reshape(b, t, n_heads, d)
    kh = k.reshape(b, t, n_heads, d)
    vh = v.reshape(b, t, n_heads, d)
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) / np.sqrt(d)
    p = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
    return (
        jnp.einsum("bhqk,bkhd->bqhd", p, vh, preferred_element_type=jnp.float32)
        .astype(vh.dtype)
        .reshape(b, t, hd)
    )


@pytest.mark.parametrize("batched", [False, True])
@pytest.mark.parametrize(
    "b,t,h,d", [(4, 50, 12, 64), (2, 10, 3, 8), (6, 7, 2, 16)]
)
def test_forward_matches_einsum_f32(b, t, h, d, batched, rng):
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, t, h * d), dtype=np.float32))
        for _ in range(3)
    )
    out = fused_attention(q, k, v, h, interpret=True, batched=batched)
    ref = _ref_attention(q, k, v, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("batched", [False, True])
def test_gradients_match_einsum_f32(batched, rng):
    b, t, h, d = 3, 11, 4, 8
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, t, h * d), dtype=np.float32))
        for _ in range(3)
    )
    # non-uniform upstream cotangent via a weighted-sum loss
    w = jnp.asarray(rng.standard_normal((b, t, h * d), dtype=np.float32))

    def loss_fused(q, k, v):
        return jnp.sum(
            w * fused_attention(q, k, v, h, interpret=True, batched=batched)
        )

    def loss_ref(q, k, v):
        return jnp.sum(w * _ref_attention(q, k, v, h))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5
        )


def test_bf16_forward_close_to_f32(rng):
    b, t, h, d = 2, 50, 12, 64
    qf, kf, vf = (
        rng.standard_normal((b, t, h * d), dtype=np.float32) for _ in range(3)
    )
    out16 = fused_attention(
        jnp.asarray(qf, jnp.bfloat16),
        jnp.asarray(kf, jnp.bfloat16),
        jnp.asarray(vf, jnp.bfloat16),
        h,
        interpret=True,
    )
    ref = _ref_attention(jnp.asarray(qf), jnp.asarray(kf), jnp.asarray(vf), h)
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(ref), rtol=0.05, atol=0.05
    )


def test_heads_are_independent(rng):
    """Perturbing head h's lanes must change ONLY head h's output lanes —
    guards the _split_heads/_merge_heads lane arithmetic at the packed
    [B,T,H*D] call boundary."""
    b, t, h, d = 2, 6, 3, 8
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, t, h * d), dtype=np.float32))
        for _ in range(3)
    )
    base = np.asarray(fused_attention(q, k, v, h, interpret=True))
    q2 = q.at[:, :, d : 2 * d].add(1.0)  # perturb head 1 only
    out = np.asarray(fused_attention(q2, k, v, h, interpret=True))
    assert not np.allclose(out[:, :, d : 2 * d], base[:, :, d : 2 * d])
    np.testing.assert_array_equal(out[:, :, :d], base[:, :, :d])
    np.testing.assert_array_equal(out[:, :, 2 * d :], base[:, :, 2 * d :])


def test_block_b_validation():
    q = jnp.zeros((6, 4, 8))
    # block_b blocks the head-folded B*H grid axis (6*2 = 12 here)
    with pytest.raises(ValueError, match="divide"):
        fused_attention(q, q, q, 2, block_b=5, interpret=True)
    with pytest.raises(ValueError, match="n_heads"):
        fused_attention(q, q, q, 3, interpret=True)


@pytest.mark.parametrize("mode", [True, "batched"])
def test_vit_fused_path_matches_einsum_path(mode, rng):
    """vit_b32_apply(fused_attn=True/'batched') == the einsum path at f32
    on a tiny ViT geometry (full-model wiring: dense packing, o-proj,
    residuals)."""
    from r3m_tpu.models.vit import ViTConfig, vit_b32_apply, vit_b32_init

    cfg = ViTConfig(
        image_size=32, patch_size=16, dim=32, n_layers=2, n_heads=4,
        hidden_dim=48,
    )
    params = vit_b32_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    ref = vit_b32_apply(params, x, cfg)
    out = vit_b32_apply(params, x, cfg, fused_attn=mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_r3m_config_rejects_fused_attn_on_resnet():
    from r3m_tpu.models.r3m import R3MConfig

    with pytest.raises(ValueError, match="vit_fused_attn"):
        R3MConfig(size=50, vit_fused_attn=True)
    R3MConfig(size=0, vit_fused_attn=True)  # valid on ViT
    R3MConfig(size=0, vit_fused_attn="batched")  # kernel lowering variant
    with pytest.raises(ValueError, match="batched"):
        R3MConfig(size=0, vit_fused_attn="bogus")


@pytest.mark.slow
@pytest.mark.parametrize("mode", [True, "batched"])
def test_vit_fused_train_step_runs(mode, rng):
    """One full train step at size=0 with the kernel wired (cfg knob) —
    gradients flow through the custom VJP inside jit."""
    from r3m_tpu.models.distilbert import distilbert_init
    from r3m_tpu.models.r3m import R3MConfig
    from r3m_tpu.training.trainer import create_train_state, make_train_step

    from .test_distilbert import SMALL

    cfg = R3MConfig(
        size=0, langweight=1.0, tcnweight=1.0, image_size=32,
        vit_fused_attn=mode, bs=2, lang_dim=SMALL.dim,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(
        cfg, bert_params=distilbert_init(jax.random.PRNGKey(1), SMALL),
        bert_cfg=SMALL, doaug="none", donate=False,
    )
    batch = {
        "images": jnp.asarray(
            rng.uniform(0, 255, size=(2, 5, 32, 32, 3)).astype(np.float32)
        ),
        "token_ids": jnp.ones((2, 8), jnp.int32),
        "attn_mask": jnp.ones((2, 8), jnp.int32),
        "lang_mask": jnp.ones((2,), jnp.float32),
    }
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["full_loss"]))


def test_precision_arg_threads_through(rng):
    """`precision` reaches every in-kernel dot: HIGHEST-precision serving
    (the 0.999-cosine parity config) must not silently run the fused
    attention at backend-default precision. On f32 CPU interpret mode all
    precisions agree exactly; this pins the plumbing (a bad argnum/partial
    wiring would raise or change gradients)."""
    b, t, h, d = 4, 10, 2, 8
    q, k, v = (rng.normal(size=(b, t, h * d)).astype(np.float32) for _ in range(3))
    base = np.asarray(fused_attention(q, k, v, h, interpret=True))
    for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT):
        out = np.asarray(
            fused_attention(q, k, v, h, interpret=True, precision=prec)
        )
        np.testing.assert_allclose(out, base, rtol=1e-6, atol=1e-6)
    g = jax.grad(
        lambda q_: jnp.sum(
            fused_attention(
                q_, k, v, h, interpret=True,
                precision=jax.lax.Precision.HIGHEST,
            )
        )
    )(q)
    assert np.all(np.isfinite(np.asarray(g)))


def test_vit_fused_serving_uses_highest_precision(rng):
    """R3MEncoder jits the ViT forward at Precision.HIGHEST; the fused
    branch must produce the same embeddings as the einsum branch at that
    precision (both interpret/XLA on CPU here)."""
    from r3m_tpu.models.vit import ViTConfig, vit_b32_apply, vit_b32_init

    cfg = ViTConfig(image_size=32, patch_size=16, dim=32, n_heads=2,
                    n_layers=2, hidden_dim=64)
    params = vit_b32_init(jax.random.PRNGKey(0), cfg)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    hi = jax.lax.Precision.HIGHEST
    ref = np.asarray(vit_b32_apply(params, x, cfg, precision=hi))
    out = np.asarray(
        vit_b32_apply(params, x, cfg, precision=hi, fused_attn=True,
                      fused_attn_interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
