"""BC probe: policy learns an action function of the embedding."""

import pytest
import numpy as np

import jax

from r3m_tpu.evalsuite.bc import bc_probe
from r3m_tpu.models.r3m import R3MConfig, R3MEncoder, r3m_init


@pytest.mark.slow
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

    res = bc_probe(enc, images, actions, steps=300, lr=1e-2, seed=0)
    assert res["train_mse_curve"][0] > 10 * res["train_mse"]
    assert res["val_mse"] < res["train_mse_curve"][0]
    assert res["embed_dim"] == 512


@pytest.mark.slow
def test_bc_probe_proprio_concat(rng):
    cfg = R3MConfig(size=18)
    state = r3m_init(jax.random.PRNGKey(1), cfg)
    enc = R3MEncoder(cfg, state["params"], state["batch_stats"])
    images = rng.integers(0, 255, size=(16, 3, 64, 64)).astype(np.float32)
    proprio = rng.normal(size=(16, 7)).astype(np.float32)
    actions = rng.normal(size=(16, 4)).astype(np.float32)
    res = bc_probe(enc, images, actions, proprio=proprio, steps=5)
    assert res["embed_dim"] == 512 + 7


def test_bc_probe_chunked_embed_matches_single_pass():
    """Chunked embedding (tail padded) must equal one whole-set forward."""
    from r3m_tpu.evalsuite.bc import _embed_chunked

    calls = []

    def embed_fn(x):
        calls.append(np.asarray(x).shape[0])
        return np.asarray(x).reshape(np.asarray(x).shape[0], -1)[:, :7]

    rng = np.random.default_rng(0)
    images = rng.normal(size=(10, 3, 4, 4)).astype(np.float32)
    out = _embed_chunked(embed_fn, images, chunk=4)
    np.testing.assert_allclose(out, images.reshape(10, -1)[:, :7])
    assert calls == [4, 4, 4]  # fixed shape incl. padded tail


def test_bc_probe_rejects_degenerate_split():
    def embed_fn(x):
        return np.asarray(x).reshape(np.asarray(x).shape[0], -1)[:, :5]

    images = np.zeros((1, 3, 4, 4), np.float32)
    actions = np.zeros((1, 2), np.float32)
    with pytest.raises(ValueError, match="no training samples"):
        bc_probe(embed_fn, images, actions, steps=2)
