"""Pallas TPU kernel: fused multi-head self-attention for ViT-B/32.

The reference's ``size == 0`` backbone is an HF ViT
(``/root/reference/r3m/models/models_r3m.py:52-56``); our XLA path
(`r3m_tpu.models.vit.vit_b32_apply`) materializes the `[B, H, T, T]`
score/prob tensors through HBM every layer and pays `bqhd -> bhqk`
relayouts on both sides of the softmax. At the bench shape (B = 160
frames, T = 50 tokens, H = 12 heads, D = 64) the attention matmuls are
~1% of the step's FLOPs — the candidate win is *traffic*: heads fold
into the grid's batch axis (`[B*H, T, D]`, a 1-D grid of batch blocks)
and each kernel instance computes QK^T -> softmax -> PV for its block
entirely in VMEM/registers, while the custom VJP recomputes the
probabilities instead of saving them (dropping the ~[B,12,50,50] x
12-layer probs residual from the activation footprint).

Layout: the public API takes the PACKED dense outputs `[B, T, H*D]`; the
call folds heads into the grid's batch dimension (`[B*H, T, D]`,
flash-attention style) so every BlockSpec covers the full `T x D` face —
the only Mosaic-legal blocking when T (50) and D (64) are smaller than
the (8, 128) tile (the last two block dims must be tile-divisible OR
equal to the array dims; a 64-lane head slice of the packed 768-lane
array is neither, and fails `_check_block_mappings` on real TPU). The
head split/merge transposes at the call boundary are the same relayouts
the einsum path pays around its `bqhd->bhqk` contractions, so the
comparison against it stays like-for-like.

Measured on the real chip (BASELINE.md round-4): the `batched` 3-D-dot
lowering wins — fwd+bwd 1.194 ms vs the einsum path's 1.527 ms at the
audit shape, +19.6% end-to-end on the ViT train step — and is the
TRAINING default via `R3MConfig.vit_fused_attn="auto"`. The 2-D-unroll
lowering's backward is slower than einsum (1.892 ms) and stays opt-in.
PARITY serving keeps the einsum path (f32/HIGHEST inference stays
on the lowering the golden pins were taken with); FAST serving (bf16)
resolves to the batched kernel — forward-only it measured +8.2% over
einsum at identical cosine (BASELINE.md fast-serving-attention row).
Real-chip lowering legality is pinned by `tests/test_tpu_kernels.py`
(`pytest -m tpu`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block_b(bh: int, block_b: int | None) -> int:
    """Batch-block over the folded [B*H] grid axis."""
    if block_b is not None:
        if bh % block_b:
            raise ValueError(f"block_b={block_b} must divide B*H={bh}")
        return block_b
    for cand in (32, 16, 8, 4, 2, 1):
        if bh % cand == 0:
            return cand
    return 1


def _split_heads(x, n_heads: int):
    """[B, T, H*D] packed -> [B*H, T, D] head-major for the kernel grid."""
    b, t, hd = x.shape
    d = hd // n_heads
    return (
        x.reshape(b, t, n_heads, d)
        .transpose(0, 2, 1, 3)
        .reshape(b * n_heads, t, d)
    )


def _merge_heads(x, b: int, n_heads: int):
    """[B*H, T, D] -> [B, T, H*D] packed."""
    bh, t, d = x.shape
    return (
        x.reshape(b, n_heads, t, d)
        .transpose(0, 2, 1, 3)
        .reshape(b, t, n_heads * d)
    )


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, precision):
    """q, k, v refs [Bb, T, D] (head folded into Bb) -> o ref [Bb, T, D]."""
    bb = q_ref.shape[0]
    for i in range(bb):  # static unroll: 2-D MXU dots per batch element
        qi, ki, vi = q_ref[i], k_ref[i], v_ref[i]
        u = jax.lax.dot_general(
            qi, ki, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        s = u * scale
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        ctx = jax.lax.dot_general(
            p.astype(vi.dtype), vi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        o_ref[i] = ctx.astype(o_ref.dtype)


def _fwd_kernel_batched(q_ref, k_ref, v_ref, o_ref, *, scale: float, precision):
    """Batched-dot variant: one 3-D dot_general over the whole [Bb, T, D]
    block instead of a Python unroll of 2-D dots. Same math; different
    Mosaic lowering (T=50 pads to the 64-sublane tile either way, but the
    batched form gives the compiler the whole block's pipelining upfront).
    The audit microbenches both; the winner is a block-shape decision, not
    an API one."""
    q, k, v = q_ref[:], k_ref[:], v_ref[:]
    u = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )
    s = u * scale
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    ctx = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )
    o_ref[:] = ctx.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float, precision):
    """Recompute-probs backward for one head-folded batch block."""
    bb = q_ref.shape[0]
    for i in range(bb):
        qi, ki, vi, doi = q_ref[i], k_ref[i], v_ref[i], do_ref[i]
        u = jax.lax.dot_general(
            qi, ki, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        s = u * scale
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # [Tq, Tk] f32
        p_lo = p.astype(vi.dtype)
        # dv = P^T dO   (contract Tq)
        dv = jax.lax.dot_general(
            p_lo, doi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        # dP = dO V^T   (contract D)
        dp = jax.lax.dot_general(
            doi, vi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        # dU = P o (dP - rowsum(dP o P)) * scale  (softmax VJP)
        du = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale).astype(
            qi.dtype
        )
        dq = jax.lax.dot_general(
            du, ki, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        # dK = dU^T Q   (contract Tq)
        dk = jax.lax.dot_general(
            du, qi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        dq_ref[i] = dq.astype(dq_ref.dtype)
        dk_ref[i] = dk.astype(dk_ref.dtype)
        dv_ref[i] = dv.astype(dv_ref.dtype)


def _bwd_kernel_batched(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                        *, scale: float, precision):
    """Batched-dot variant of the recompute-probs backward (see
    _fwd_kernel_batched for why both lowerings exist)."""
    q, k, v, do = q_ref[:], k_ref[:], v_ref[:], do_ref[:]
    u = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )
    s = u * scale
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # [Bb, Tq, Tk] f32
    p_lo = p.astype(v.dtype)
    # dv = P^T dO  (contract Tq per batch element)
    dv = jax.lax.dot_general(
        p_lo, do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )
    # dP = dO V^T  (contract D)
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )
    du = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale).astype(
        q.dtype
    )
    dq = jax.lax.dot_general(
        du, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )
    # dK = dU^T Q  (contract Tq)
    dk = jax.lax.dot_general(
        du, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _specs(block_b: int, t: int, d: int, n: int):
    # block covers the full T x D face: T and D (50, 64) are below the
    # (8, 128) Mosaic tile, so "equal to the array dims" is the only
    # legal blocking for the last two axes
    return [
        pl.BlockSpec((block_b, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(n)
    ]


def _fwd_call(q, k, v, n_heads, block_b, interpret, precision, batched=False):
    b, t, hd = q.shape
    d = hd // n_heads
    qf, kf, vf = (_split_heads(x, n_heads) for x in (q, k, v))
    bb = _pick_block_b(b * n_heads, block_b)
    kernel = _fwd_kernel_batched if batched else _fwd_kernel
    out = pl.pallas_call(
        functools.partial(kernel, scale=1.0 / np.sqrt(d),
                          precision=precision),
        grid=(b * n_heads // bb,),
        in_specs=_specs(bb, t, d, 3),
        out_specs=_specs(bb, t, d, 1)[0],
        out_shape=jax.ShapeDtypeStruct((b * n_heads, t, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return _merge_heads(out, b, n_heads)


def _bwd_call(q, k, v, do, n_heads, block_b, interpret, precision,
              batched=False):
    b, t, hd = q.shape
    d = hd // n_heads
    qf, kf, vf, dof = (_split_heads(x, n_heads) for x in (q, k, v, do))
    bb = _pick_block_b(b * n_heads, block_b)
    shape = jax.ShapeDtypeStruct((b * n_heads, t, d), q.dtype)
    kernel = _bwd_kernel_batched if batched else _bwd_kernel
    dq, dk, dv = pl.pallas_call(
        functools.partial(kernel, scale=1.0 / np.sqrt(d),
                          precision=precision),
        grid=(b * n_heads // bb,),
        in_specs=_specs(bb, t, d, 4),
        out_specs=tuple(_specs(bb, t, d, 3)),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )(qf, kf, vf, dof)
    return tuple(_merge_heads(g, b, n_heads) for g in (dq, dk, dv))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_attention(q, k, v, n_heads: int, block_b: int | None = None,
                    interpret: bool = False, precision=None,
                    batched: bool = False):
    """Softmax(QK^T / sqrt(D)) V per head, fused in VMEM.

    q, k, v: ``[B, T, n_heads * D]`` packed head-major (the natural dense
    output; head ``h`` occupies lanes ``[h*D, (h+1)*D)``). Returns the
    context in the same packed layout — feed it straight to the output
    projection. Scores/probs never touch HBM; the VJP recomputes them.

    `precision`: forwarded to every in-kernel dot (same contract as the
    einsum path's `precision=` — parity-grade serving passes HIGHEST).
    `block_b`: grid batch-block size; it blocks the HEAD-FOLDED axis, so
    it must divide ``B * n_heads`` (not B alone). Default: the largest of
    32/16/8/4/2/1 that divides.
    `batched`: use one 3-D dot per block instead of the per-element 2-D
    unroll (identical math, different Mosaic lowering; the ViT audit
    microbenches both).
    """
    if q.shape[-1] % n_heads:
        raise ValueError(f"dim {q.shape[-1]} not divisible by n_heads={n_heads}")
    return _fwd_call(q, k, v, n_heads, block_b, interpret, precision, batched)


def _vjp_fwd(q, k, v, n_heads, block_b, interpret, precision, batched):
    return (
        _fwd_call(q, k, v, n_heads, block_b, interpret, precision, batched),
        (q, k, v),
    )


def _vjp_bwd(n_heads, block_b, interpret, precision, batched, res, g):
    q, k, v = res
    return _bwd_call(q, k, v, g, n_heads, block_b, interpret, precision,
                     batched)


fused_attention.defvjp(_vjp_fwd, _vjp_bwd)
