"""Shared transformer layer primitives for the ViT and DistilBERT backbones.

One implementation of LayerNorm and Dense serves both
(``r3m_tpu/models/vit.py``, ``r3m_tpu/models/distilbert.py``) so numerics
fixes cannot drift between them: statistics in f32 regardless of compute
dtype (exact no-op for the frozen f32 DistilBERT path; required for the
bf16 ViT path), params in f32 cast to the activation dtype on use, f32
accumulation on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x, p, eps):
    """LayerNorm over the last axis; f32 statistics, output in x.dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def dense(x, p, precision=None):
    """x @ w + b; params live in f32, compute in x.dtype, f32 accumulation."""
    out = jnp.dot(
        x,
        p["w"].astype(x.dtype),
        precision=precision,
        preferred_element_type=jnp.float32,
    ) + p["b"]
    return out.astype(x.dtype)


def torch_to_np(t):
    """torch tensor / array-like -> float32 numpy (shared converter law)."""
    import numpy as np

    return np.asarray(
        t.detach().cpu().numpy() if hasattr(t, "detach") else t,
        dtype=np.float32,
    )


def convert_linear(sd, prefix):
    """HF torch ``{prefix}.weight/bias`` ([out, in]) -> dense pytree ([in, out])."""
    return {
        "w": torch_to_np(sd[f"{prefix}.weight"]).T,
        "b": torch_to_np(sd[f"{prefix}.bias"]),
    }


def convert_layer_norm(sd, prefix):
    """HF torch LayerNorm ``{prefix}.weight/bias`` -> layer_norm pytree."""
    return {
        "scale": torch_to_np(sd[f"{prefix}.weight"]),
        "bias": torch_to_np(sd[f"{prefix}.bias"]),
    }
