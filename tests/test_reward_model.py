"""Reward-model serving API: snapshot -> language-conditioned reward scores."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from r3m_tpu.checkpoint import save_snapshot, save_train_snapshot
from r3m_tpu.models.distilbert import distilbert_init
from r3m_tpu.models.r3m import R3MConfig
from r3m_tpu.reward import R3MRewardModel
from r3m_tpu.training.trainer import create_train_state

pytestmark = pytest.mark.slow  # module-scoped model fixture dominates; smoke skips

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "pick", "up", "cup", "door", "open"]


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    d = tmp_path_factory.mktemp("reward")
    cfg = R3MConfig(size=18, langweight=1.0, image_size=32)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    snap = save_train_snapshot(str(d), state, cfg, keep_step_copy=False)
    bert = os.path.join(d, "bert.npz")
    save_snapshot(bert, distilbert_init(jax.random.PRNGKey(1)))
    vocab = os.path.join(d, "vocab.txt")
    with open(vocab, "w") as f:
        f.write("\n".join(VOCAB) + "\n")
    return snap, bert, vocab


def test_reward_from_embeddings(artifacts):
    snap, bert, vocab = artifacts
    rm = R3MRewardModel.from_snapshot(snap, bert, vocab)
    assert rm.cfg.size == 18 and rm.cfg.langweight == 1.0
    e0 = jnp.zeros((2, 512)) + 0.1
    es = jnp.zeros((2, 512)) + 0.2
    r = rm.get_reward(e0, es, ["pick up the cup", "open the door"])
    assert r.shape == (2,)
    assert np.all(np.isfinite(np.asarray(r)))
    # different instruction -> different score (language reaches the MLP)
    r2 = rm.get_reward(e0, es, ["open the door", "open the door"])
    assert not np.allclose(np.asarray(r)[0], np.asarray(r2)[0])


def test_reward_from_images(artifacts):
    snap, bert, vocab = artifacts
    rm = R3MRewardModel.from_snapshot(snap, bert, vocab)
    rng = np.random.default_rng(0)
    im0 = rng.integers(0, 255, size=(2, 3, 32, 32)).astype(np.float32)
    imt = rng.integers(0, 255, size=(2, 3, 32, 32)).astype(np.float32)
    r = rm(im0, imt, ["pick up the cup", "open the door"])
    assert r.shape == (2,) and np.all(np.isfinite(np.asarray(r)))


def test_reward_requires_language_head(artifacts, tmp_path):
    _, bert, vocab = artifacts
    cfg = R3MConfig(size=18, langweight=0.0, image_size=32)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    snap = save_train_snapshot(str(tmp_path), state, cfg, keep_step_copy=False)
    with pytest.raises(ValueError, match="language head"):
        R3MRewardModel.from_snapshot(snap, bert, vocab)


def test_reward_curve_over_trajectory(artifacts):
    snap, bert, vocab = artifacts
    rm = R3MRewardModel.from_snapshot(snap, bert, vocab)
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, size=(6, 3, 32, 32)).astype(np.float32)
    curve = rm.reward_curve(frames, "open the door")
    assert curve.shape == (6,) and np.all(np.isfinite(np.asarray(curve)))
    # r_0 must equal the degenerate (e0, e0) score from the pairwise API
    e0 = rm.embed(frames[:1])
    r00 = rm.get_reward(e0, e0, ["open the door"])
    np.testing.assert_allclose(
        np.asarray(curve)[0], np.asarray(r00)[0], rtol=1e-5
    )


def test_reward_pad_modes_and_meta_lang_max_len(artifacts, tmp_path):
    """pad_mode semantics + lang_max_len recovery from snapshot metadata."""
    snap, bert, vocab = artifacts
    # training-time lang_max_len persisted via extra_meta is recovered
    cfg = R3MConfig(size=18, langweight=1.0, image_size=32)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    snap16 = save_train_snapshot(
        str(tmp_path), state, cfg, keep_step_copy=False,
        extra_meta={"lang_max_len": 16},
    )
    rm16 = R3MRewardModel.from_snapshot(snap16, bert, vocab)
    assert rm16.lang_max_len == 16

    # fixed vs longest padding: mean-pool includes padding, so the scores
    # differ — and "longest" must match an explicit max_len of that length
    rm_fixed = R3MRewardModel.from_snapshot(snap, bert, vocab)
    rm_long = R3MRewardModel.from_snapshot(snap, bert, vocab, pad_mode="longest")
    e0 = jnp.zeros((1, 512)) + 0.1
    es = jnp.zeros((1, 512)) + 0.2
    r_fixed = rm_fixed.get_reward(e0, es, ["pick up the cup"])
    r_long = rm_long.get_reward(e0, es, ["pick up the cup"])
    assert not np.allclose(np.asarray(r_fixed), np.asarray(r_long))
    n_tok = len(rm_long.tokenizer.encode("pick up the cup"))
    rm_exact = R3MRewardModel.from_snapshot(snap, bert, vocab, lang_max_len=n_tok)
    np.testing.assert_allclose(
        np.asarray(r_long),
        np.asarray(rm_exact.get_reward(e0, es, ["pick up the cup"])),
        rtol=1e-6,
    )


def test_reward_from_torch_snapshot(artifacts, tmp_path):
    """Reference-format snapshot.pt serves rewards (longest-pad default)."""
    from r3m_tpu.checkpoint import export_torch_snapshot

    snap, bert, vocab = artifacts
    cfg = R3MConfig(size=18, langweight=1.0, image_size=32)
    state = create_train_state(cfg, jax.random.PRNGKey(3))
    pt = str(tmp_path / "snapshot.pt")
    export_torch_snapshot(pt, state, size=18)
    rm = R3MRewardModel.from_torch_snapshot(pt, bert, vocab)
    assert rm.pad_mode == "longest"
    r = rm.get_reward(
        jnp.zeros((2, 512)), jnp.ones((2, 512)),
        ["pick up the cup", "open the door"],
    )
    assert r.shape == (2,) and np.all(np.isfinite(np.asarray(r)))


def test_reward_from_torch_snapshot_embedded_bert(artifacts, tmp_path):
    """Language-trained reference snapshots are self-contained: R3M registers
    the frozen LangEncoder as a submodule (models_r3m.py:70), so
    state_dict() carries the whole HF DistilBertModel under
    `module.lang_enc.model.*`. from_torch_snapshot(bert_weights=None) must
    serve from those embedded weights, and the converted encoder must match
    the GENUINE transformers DistilBertModel forward bit-for-tolerance."""
    import torch
    from transformers import DistilBertConfig as HFConfig, DistilBertModel

    from r3m_tpu.checkpoint import export_torch_snapshot

    _, _, vocab = artifacts
    cfg = R3MConfig(size=18, langweight=1.0, image_size=32)
    state = create_train_state(cfg, jax.random.PRNGKey(5))
    pt = str(tmp_path / "snapshot.pt")
    export_torch_snapshot(pt, state, size=18)

    # dim must be LANG_DIM=768 (the reward head's lang input width); one
    # layer + small vocab/ffn keep the fixture light
    hf = DistilBertModel(
        HFConfig(
            vocab_size=30, dim=768, n_layers=1, n_heads=12, hidden_dim=48,
            max_position_embeddings=32,
        )
    ).eval()
    payload = torch.load(pt, map_location="cpu", weights_only=True)
    sd = dict(payload["r3m"])
    for k, v in hf.state_dict().items():
        sd[f"module.lang_enc.model.{k}"] = v
    torch.save({"r3m": sd, "global_step": 0}, pt)

    rm = R3MRewardModel.from_torch_snapshot(pt, None, vocab)

    ids = torch.tensor([[2, 5, 6, 4, 7, 3, 0, 0], [2, 9, 4, 8, 3, 0, 0, 0]])
    mask = torch.tensor([[1] * 6 + [0] * 2, [1] * 5 + [0] * 3])
    with torch.no_grad():
        ref = hf(ids, attention_mask=mask).last_hidden_state.mean(1).numpy()
    ours = np.asarray(
        rm._lang(rm.bert_params, jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    r = rm.get_reward(
        jnp.zeros((2, 512)), jnp.ones((2, 512)),
        ["pick up the cup", "open the door"],
    )
    assert r.shape == (2,) and np.all(np.isfinite(np.asarray(r)))


def test_from_torch_snapshot_without_embedded_bert_needs_weights(artifacts, tmp_path):
    from r3m_tpu.checkpoint import export_torch_snapshot

    _, _, vocab = artifacts
    cfg = R3MConfig(size=18, langweight=1.0, image_size=32)
    state = create_train_state(cfg, jax.random.PRNGKey(6))
    pt = str(tmp_path / "snapshot.pt")
    export_torch_snapshot(pt, state, size=18)
    with pytest.raises(ValueError, match="lang_enc"):
        R3MRewardModel.from_torch_snapshot(pt, None, vocab)


def test_reward_from_torch_vit_snapshot(artifacts, tmp_path):
    """A reference-format ViT (size==0) training snapshot serves rewards;
    the crop size comes from the pos-embedding table, not the 224 default."""
    from types import SimpleNamespace

    from r3m_tpu.checkpoint import export_torch_snapshot

    _, bert, vocab = artifacts
    cfg = R3MConfig(size=0, langweight=1.0, image_size=64)
    state = create_train_state(cfg, jax.random.PRNGKey(2))
    pt = str(tmp_path / "snapshot.pt")
    export_torch_snapshot(
        pt,
        SimpleNamespace(
            params=state.params, batch_stats=state.batch_stats, step=state.step
        ),
        size=0,
    )

    rm = R3MRewardModel.from_torch_snapshot(pt, bert, vocab)
    assert rm.cfg.size == 0 and rm.cfg.image_size == 64
    rng = np.random.default_rng(0)
    im0 = rng.integers(0, 255, size=(2, 3, 64, 64)).astype(np.float32)
    imt = rng.integers(0, 255, size=(2, 3, 64, 64)).astype(np.float32)
    r = rm(im0, imt, ["pick up the cup", "open the door"])
    assert r.shape == (2,) and np.all(np.isfinite(np.asarray(r)))


def test_reward_fast_precision(artifacts):
    """precision='fast' threads to the internal encoder; rewards stay close.

    The image-encode is the only stage the lever touches (BERT + the MLP
    stay f32), so fast-vs-parity reward scores differ only through bf16
    embedding rounding.
    """
    snap, bert, vocab = artifacts
    rm = R3MRewardModel.from_snapshot(snap, bert, vocab)
    rm_fast = R3MRewardModel.from_snapshot(snap, bert, vocab, precision="fast")
    assert rm_fast._encoder.precision == "fast"
    rng = np.random.default_rng(0)
    im0 = rng.integers(0, 255, size=(2, 3, 32, 32)).astype(np.float32)
    imt = rng.integers(0, 255, size=(2, 3, 32, 32)).astype(np.float32)
    sents = ["pick up the cup", "open the door"]
    r = np.asarray(rm(im0, imt, sents))
    rf = np.asarray(rm_fast(im0, imt, sents))
    assert rf.shape == r.shape and np.all(np.isfinite(rf))
    # random-init embeddings are O(1); bf16 rounding moves scores by <<1
    np.testing.assert_allclose(rf, r, atol=0.05)
