"""BC probe: policy learns an action function of the embedding."""

import numpy as np

import jax

from r3m_tpu.evalsuite.bc import bc_probe
from r3m_tpu.models.r3m import R3MConfig, R3MEncoder, r3m_init


def test_bc_probe_learns(rng):
    cfg = R3MConfig(size=18)
    state = r3m_init(jax.random.PRNGKey(0), cfg)
    enc = R3MEncoder(cfg, state["params"], state["batch_stats"])

    # 64 distinct "demo frames": random uint8 images; actions are a fixed
    # linear function of the (frozen) embedding => learnable to low MSE.
    images = rng.integers(0, 255, size=(64, 3, 64, 64)).astype(np.float32)
    emb = np.asarray(enc(images))
    w = rng.normal(size=(emb.shape[1], 4)).astype(np.float32)
    actions = emb @ w / np.sqrt(emb.shape[1])

    res = bc_probe(enc, images, actions, epochs=300, lr=1e-2, seed=0)
    assert res["train_mse_curve"][0] > 10 * res["train_mse"]
    assert res["val_mse"] < res["train_mse_curve"][0]
    assert res["embed_dim"] == 512


def test_bc_probe_proprio_concat(rng):
    cfg = R3MConfig(size=18)
    state = r3m_init(jax.random.PRNGKey(1), cfg)
    enc = R3MEncoder(cfg, state["params"], state["batch_stats"])
    images = rng.integers(0, 255, size=(16, 3, 64, 64)).astype(np.float32)
    proprio = rng.normal(size=(16, 7)).astype(np.float32)
    actions = rng.normal(size=(16, 4)).astype(np.float32)
    res = bc_probe(enc, images, actions, proprio=proprio, epochs=5)
    assert res["embed_dim"] == 512 + 7
