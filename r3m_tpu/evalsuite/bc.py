"""Behavior-cloning probe: downstream evaluation of a frozen representation.

The reference evaluates R3M on an out-of-repo `eval` git branch (behavior
cloning on robot-manipulation suites, ``/root/reference/README.md:36-38``).
This module provides the in-repo equivalent protocol: freeze the visual
encoder, embed demonstration frames, and train a small MLP policy
embedding(+proprio) -> action by MSE — the standard R3M evaluation recipe
(arXiv:2203.12601 §4). The whole probe (embed + policy train loop) is
jitted; the policy update runs `lax.scan` over minibatch steps on device.

Usage:
    r3m = load_r3m("resnet50")
    result = bc_probe(embed_fn=r3m, images=imgs, actions=acts)
    result["val_mse"], result["policy_params"]
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

Pytree = dict


def _mlp_init(key, sizes):
    params = []
    for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
        k, key = jax.random.split(key)
        params.append(
            {
                "w": jax.random.normal(k, (a, b)) * np.sqrt(2.0 / a),
                "b": jnp.zeros((b,)),
            }
        )
    return params


def _mlp_apply(params, x):
    for i, layer in enumerate(params):
        x = x @ layer["w"] + layer["b"]
        if i + 1 < len(params):
            x = jax.nn.relu(x)
    return x


def _embed_chunked(embed_fn: Callable, images, chunk: int) -> np.ndarray:
    """Embed in fixed-size batches (tail padded by repetition, then cut).

    One device forward over the whole demo set would both OOM on realistic
    sizes (50k frames of 224px f32 ≈ 30 GB input) and compile a one-off
    program; fixed chunks reuse one compiled shape.
    """
    from r3m_tpu.utils.misc import pad_batch

    images = np.asarray(images)
    n = images.shape[0]
    if n <= chunk:
        return np.asarray(embed_fn(images))
    outs = []
    for i in range(0, n, chunk):
        x = images[i : i + chunk]
        m = x.shape[0]
        outs.append(np.asarray(embed_fn(pad_batch(x, chunk)))[:m])
    return np.concatenate(outs)


def bc_probe(
    embed_fn: Callable,
    images,
    actions,
    proprio: Optional[np.ndarray] = None,
    hidden: int = 256,
    steps: int = 100,
    lr: float = 1e-3,
    batch: int = 256,
    val_frac: float = 0.2,
    seed: int = 0,
    embed_batch: int = 256,
) -> Dict:
    """Train an MLP policy on frozen embeddings; returns train/val MSE.

    `embed_fn`: maps NCHW uint8-range images -> [N, D] embeddings (e.g. the
    module returned by `load_r3m`). `images`: [N, 3, H, W] in [0, 255].
    `actions`: [N, A]. Optional `proprio` [N, P] is concatenated to the
    embedding (the reference protocol feeds proprioception alongside).

    `steps` counts GRADIENT STEPS: each draws one `batch`-sized minibatch
    with replacement (not full passes over the data — size `steps`
    accordingly for large demo sets). Embedding runs in `embed_batch`-sized
    chunks so arbitrarily large demo sets fit on device.
    """
    emb = _embed_chunked(embed_fn, images, embed_batch)
    if proprio is not None:
        emb = np.concatenate([emb, np.asarray(proprio)], axis=1)
    actions = np.asarray(actions, dtype=np.float32)
    n = emb.shape[0]
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    n_val = max(1, int(n * val_frac))
    val_idx, tr_idx = order[:n_val], order[n_val:]
    if tr_idx.size == 0:
        raise ValueError(
            f"no training samples left: n={n}, val_frac={val_frac} "
            "(need at least 2 samples with val_frac < 1)"
        )
    x_tr = jnp.asarray(emb[tr_idx])
    y_tr = jnp.asarray(actions[tr_idx])
    x_val = jnp.asarray(emb[val_idx])
    y_val = jnp.asarray(actions[val_idx])

    key = jax.random.PRNGKey(seed)
    params = _mlp_init(key, [emb.shape[1], hidden, hidden, actions.shape[1]])
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    batch = min(batch, x_tr.shape[0])

    @jax.jit
    def run(params, opt_state, key):
        def one_step(carry, k):
            params, opt_state = carry
            idx = jax.random.randint(k, (batch,), 0, x_tr.shape[0])
            xb, yb = x_tr[idx], y_tr[idx]

            def loss_fn(p):
                return jnp.mean((_mlp_apply(p, xb) - yb) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, steps)
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys
        )
        val_mse = jnp.mean((_mlp_apply(params, x_val) - y_val) ** 2)
        return params, losses, val_mse

    params, losses, val_mse = run(params, opt_state, key)
    return {
        "policy_params": params,
        "train_mse_curve": np.asarray(losses),
        "train_mse": float(losses[-1]),
        "val_mse": float(val_mse),
        "embed_dim": int(emb.shape[1]),
        "policy_apply": lambda p, e: _mlp_apply(p, e),
    }
