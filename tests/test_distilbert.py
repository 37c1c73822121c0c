"""DistilBERT-JAX parity vs HuggingFace torch DistilBertModel (random init).

The environment is offline (no pretrained downloads), so parity is checked
against a from-config randomly initialized HF model — which exercises the
identical architecture + numerics paths the pretrained weights would.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

import pytest

from r3m_tpu.models.distilbert import (
    DistilBertConfig,
    convert_distilbert,
    distilbert_apply,
    sentence_embedding,
)

SMALL = DistilBertConfig(
    vocab_size=200, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
    max_position_embeddings=48,
)


def _hf_model(cfg):
    from transformers import DistilBertConfig as HFConfig, DistilBertModel

    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        dim=cfg.dim,
        n_layers=cfg.n_layers,
        n_heads=cfg.n_heads,
        hidden_dim=cfg.hidden_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        dropout=0.0,
        attention_dropout=0.0,
    )
    return DistilBertModel(hf_cfg).eval()


@pytest.mark.slow
def test_last_hidden_state_parity(rng):
    tm = _hf_model(SMALL)
    params = convert_distilbert(tm.state_dict(), SMALL)

    ids = rng.integers(0, SMALL.vocab_size, size=(3, 12))
    mask = np.ones((3, 12), dtype=np.int64)
    mask[0, 8:] = 0  # padded row
    mask[2, 5:] = 0

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    ours = distilbert_apply(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32), SMALL
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_sentence_embedding_includes_padding(rng):
    """Reference pools mean over ALL tokens (models_language.py:34)."""
    tm = _hf_model(SMALL)
    params = convert_distilbert(tm.state_dict(), SMALL)

    ids = rng.integers(0, SMALL.vocab_size, size=(2, 10))
    mask = np.ones((2, 10), dtype=np.int64)
    mask[1, 4:] = 0

    with torch.no_grad():
        ref = (
            tm(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
            .last_hidden_state.mean(1)
            .numpy()
        )
    ours = sentence_embedding(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32), SMALL
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_config_from_state_accepts_head_prefix_and_rejects_garbage():
    """Head saves (DistilBertFor*) keep the encoder under "distilbert." —
    both config inference and conversion must strip it; a state dict with
    no transformer layers must fail with a layout-naming error."""
    from r3m_tpu.models.distilbert import distilbert_config_from_state

    sd = _hf_model(SMALL).state_dict()
    prefixed = {f"distilbert.{k}": v for k, v in sd.items()}
    cfg = distilbert_config_from_state(prefixed, n_heads=SMALL.n_heads)
    assert (cfg.dim, cfg.n_layers) == (SMALL.dim, SMALL.n_layers)
    p_direct = convert_distilbert(sd, cfg)
    p_prefixed = convert_distilbert(prefixed, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_direct), jax.tree_util.tree_leaves(p_prefixed)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    bad = {
        "embeddings.word_embeddings.weight": np.zeros((5, 4), np.float32),
        "embeddings.position_embeddings.weight": np.zeros((8, 4), np.float32),
    }
    with pytest.raises(ValueError, match="transformer.layer"):
        distilbert_config_from_state(bad)


def test_over_length_sequence_fails_loudly(rng):
    """t > max_position_embeddings must raise, not silently clamp.

    XLA clamps out-of-bounds gathers, so positions past the table would
    all reuse the last row — quietly wrong sentence embeddings where
    HF/torch raises an index error (regression guard)."""
    from r3m_tpu.models.distilbert import distilbert_init

    params = distilbert_init(jax.random.PRNGKey(0), SMALL)
    t = SMALL.max_position_embeddings + 1
    ids = jnp.asarray(rng.integers(0, SMALL.vocab_size, size=(2, t)), jnp.int32)
    mask = jnp.ones((2, t), jnp.int32)
    with pytest.raises(ValueError, match="position-embedding table"):
        distilbert_apply(params, ids, mask, SMALL)
    # the boundary length still works
    out = distilbert_apply(params, ids[:, :-1], mask[:, :-1], SMALL)
    assert out.shape == (2, t - 1, SMALL.dim)
