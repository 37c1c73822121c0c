"""Language-conditioned reward head: G(e0, eg, lang) -> scalar score.

Functional port of the reference's trainable 5-layer ReLU MLP
(``/root/reference/r3m/models/models_language.py:37-55``): input is
``concat([e0, eg, le], -1)`` with ``im_dim*2 + lang_dim`` features, four
hidden layers of ``hidden_dim`` and a scalar output. The reference calls
this ~15 times per step on [B]-sized slices (trainer.py:72-92); here the
caller batches all pair-scores into ONE application over a stacked
[N, feat] matrix so the whole head runs as a handful of large MXU matmuls.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def _torch_linear_init(key, fan_in: int, fan_out: int):
    """torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (fan_out,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def language_reward_init(
    key, im_dim: int, hidden_dim: int, lang_dim: int = 768
) -> Dict[str, Any]:
    dims = [im_dim * 2 + lang_dim] + [hidden_dim] * 4 + [1]
    keys = jax.random.split(key, 5)
    layers: List[Dict[str, jax.Array]] = [
        _torch_linear_init(keys[i], dims[i], dims[i + 1]) for i in range(5)
    ]
    return {"layers": layers}


def language_reward_apply(
    params: Dict[str, Any], e0: jax.Array, eg: jax.Array, le: jax.Array
) -> jax.Array:
    """Score [N, D],[N, D],[N, L] -> [N]. Accepts any leading batch shape."""
    x = jnp.concatenate([e0, eg, le], axis=-1)
    for i, layer in enumerate(params["layers"]):
        x = (
            jnp.dot(x, layer["w"], preferred_element_type=jnp.float32)
            + layer["b"]
        )
        if i < len(params["layers"]) - 1:
            x = jax.nn.relu(x)
    return jnp.squeeze(x, axis=-1)
