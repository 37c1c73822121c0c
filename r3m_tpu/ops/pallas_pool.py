"""Pallas TPU kernel: fused 3x3/stride-2 max-pool with argmax custom VJP.

The ResNet stem's MaxPool2d(3, stride=2, padding=1) (torchvision; reference
backbone ``/root/reference/r3m/models/models_r3m.py:44-52``) is the one op
XLA lowers poorly in this model: the backward becomes `select-and-scatter`,
which re-reads the 112x112 stem activation per window position (~2% of the
train step at <1% MXU utilization in the profile). These kernels do one
HBM pass each way instead:

* forward: per-image grid; a row loop computes max AND argmax (0..8 window
  offset) together, de-striding the stride-2 window reads with a
  pair-reshape ([W+2] -> [W/2+1, 2]) so Mosaic sees only contiguous slices;
* backward: scatter-free — each 3x3 window offset's masked gradient is
  rebuilt into strided positions by stacking pairs, accumulated into a VMEM
  scratch row-by-row, one HBM write at the end.

`maxpool_3x3s2` is a drop-in replacement for the reduce_window call in
`r3m_tpu.models.resnet.max_pool_3x3s2` (tests run the kernels in
interpreter mode on CPU; bit-exact fwd AND bwd vs the lax reference —
argmax ties take the FIRST maximal window position, row-major, matching
select-and-scatter's gradient convention).

MEASURED RESULT (TPU v5e, [320,112,112,64] bf16): this kernel is bit-exact
but SLOWER than XLA's native lowering — fwd 25.1ms vs 4.1ms, fwd+bwd
31.0ms vs 17.5ms. Mosaic relayouts for the de-striding pair-reshapes
dominate; XLA's reduce_window/select-and-scatter is already tuned for this
pattern. The default compute path therefore stays on lax.reduce_window
(`r3m_tpu.models.resnet.max_pool_3x3s2`); this module is kept as the
framework's tested Pallas custom-VJP reference and is NOT wired into the
hot path — an evidence-based decision, see BASELINE.md's roofline notes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38  # sentinel for padded positions (finite: keeps VPU happy)


def _fwd_kernel(x_ref, y_ref, idx_ref):
    """x [1, H, W, C] -> y, idx [1, H/2, W/2, C] (idx in 0..8, int32)."""
    _, h, w, c = x_ref.shape
    ho, wo = h // 2, w // 2
    negcol = jnp.full((1, c), NEG, jnp.float32)

    def row_body(out_r, _):
        best = jnp.full((wo, c), NEG, jnp.float32)
        idx = jnp.zeros((wo, c), jnp.int32)
        for dh in range(3):
            r = 2 * out_r + dh - 1
            valid = jnp.logical_and(r >= 0, r < h)
            rr = jnp.clip(r, 0, h - 1)
            row = x_ref[0, rr].astype(jnp.float32)  # [W, C] (ref dyn index)
            row = jnp.where(valid, row, NEG)
            row = jnp.concatenate([negcol, row, negcol], axis=0)  # [W+2, C]
            pairs = row.reshape(wo + 1, 2, c)
            for dw in range(3):
                if dw == 0:
                    cand = pairs[:wo, 0]
                elif dw == 1:
                    cand = pairs[:wo, 1]
                else:
                    cand = pairs[1:, 0]
                k = dh * 3 + dw
                take = cand > best  # strict: first max wins (row-major)
                best = jnp.where(take, cand, best)
                idx = jnp.where(take, k, idx)
        y_ref[0, out_r] = best.astype(y_ref.dtype)
        idx_ref[0, out_r] = idx
        return ()

    jax.lax.fori_loop(0, ho, row_body, ())


def _bwd_kernel(idx_ref, g_ref, gx_ref, acc):
    """idx, g [1, HO, WO, C] -> gx [1, 2HO, 2WO, C]; acc: f32 VMEM scratch."""
    _, ho, wo, c = idx_ref.shape
    h, w = 2 * ho, 2 * wo
    acc[...] = jnp.zeros_like(acc)

    def row_body(r, _):
        g = g_ref[0, r].astype(jnp.float32)  # [WO, C]
        idx = idx_ref[0, r]
        zcol = jnp.zeros((1, c), jnp.float32)
        for dh in range(3):
            hi = 2 * r + dh - 1
            valid = jnp.logical_and(hi >= 0, hi < h)
            hic = jnp.clip(hi, 0, h - 1)
            a = jnp.where(idx == dh * 3 + 0, g, 0.0)
            b = jnp.where(idx == dh * 3 + 1, g, 0.0)
            cc = jnp.where(idx == dh * 3 + 2, g, 0.0)
            # padded-W row [W+2, C]: col q0 gets A[q] + C[q-1], q1 gets B[q]
            q0 = jnp.concatenate([a, zcol], 0) + jnp.concatenate([zcol, cc], 0)
            q1 = jnp.concatenate([b, zcol], 0)
            roww = jnp.stack([q0, q1], axis=1).reshape(w + 2, c)
            row = jnp.where(valid, roww[1 : w + 1], 0.0)  # drop W pad
            acc[hic] = acc[hic] + row
        return ()

    jax.lax.fori_loop(0, ho, row_body, ())
    gx_ref[0] = acc[...].astype(gx_ref.dtype)


def _fwd_call(x, interpret=False):
    n, h, w, c = x.shape
    ho, wo = h // 2, w // 2
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((1, ho, wo, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ho, wo, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, ho, wo, c), x.dtype),
            jax.ShapeDtypeStruct((n, ho, wo, c), jnp.int32),
        ),
        interpret=interpret,
    )(x)


def _bwd_call(idx, g, interpret=False):
    n, ho, wo, c = idx.shape
    h, w = 2 * ho, 2 * wo
    return pl.pallas_call(
        _bwd_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, ho, wo, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ho, wo, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), g.dtype),
        scratch_shapes=[pltpu.VMEM((h, w, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024  # f32 scratch + blocks > 16M default
        ),
        interpret=interpret,
    )(idx, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def maxpool_3x3s2(x, interpret=False):
    """Fused Pallas MaxPool2d(3, stride=2, padding=1) over NHWC (H, W even)."""
    y, _ = _fwd_call(x, interpret)
    return y


def _vjp_fwd(x, interpret):
    y, idx = _fwd_call(x, interpret)
    return y, idx


def _vjp_bwd(interpret, idx, g):
    return (_bwd_call(idx, g, interpret),)


maxpool_3x3s2.defvjp(_vjp_fwd, _vjp_bwd)
