"""`python -m r3m_tpu.prepare_language` — the language-artifact prep CLI.

The reference downloads DistilBERT from the HuggingFace hub at run time
(``/root/reference/r3m/models/models_language.py:19-20``); here the weights
and vocab are prepared ONCE into framework artifacts. Offline test: save a
tiny random DistilBertModel + tokenizer to a local directory with
`save_pretrained`, run the prep against that path, and check the artifacts
round-trip through the training loader."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "robot",
         "##s", "open", "door"]


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    from transformers import DistilBertConfig, DistilBertModel, DistilBertTokenizer

    d = tmp_path_factory.mktemp("hf_distilbert")
    model = DistilBertModel(
        DistilBertConfig(
            vocab_size=len(VOCAB), dim=32, n_layers=2, n_heads=4,
            hidden_dim=64, max_position_embeddings=16,
        )
    )
    model.save_pretrained(str(d))
    vocab_file = str(d / "src_vocab.txt")
    with open(vocab_file, "w") as f:
        f.write("\n".join(VOCAB) + "\n")
    DistilBertTokenizer(vocab_file=vocab_file).save_pretrained(str(d))
    return str(d)


def test_prepare_language_artifacts_roundtrip(hf_dir, tmp_path):
    from r3m_tpu.models.distilbert import distilbert_apply
    from r3m_tpu.prepare_language import prepare
    from r3m_tpu.training.workspace import load_bert_params

    out = str(tmp_path / "lang")
    prepare(hf_dir, out)

    vocab_path = os.path.join(out, "vocab.txt")
    with open(vocab_path) as f:
        assert f.read().splitlines() == VOCAB  # id-ordered, lossless

    params, cfg = load_bert_params(os.path.join(out, "distilbert.npz"))
    # the snapshot metadata carries the FULL architecture — including
    # n_heads, which weight shapes cannot determine
    assert (cfg.dim, cfg.n_layers, cfg.n_heads, cfg.hidden_dim) == (32, 2, 4, 64)
    assert cfg.vocab_size == len(VOCAB) and cfg.max_position_embeddings == 16

    # the converted tree drives the real forward at the recovered geometry
    ids = np.array([[2, 5, 6, 3]], np.int32)
    mask = np.ones_like(ids)
    hidden = distilbert_apply(params, ids, mask, cfg=cfg)
    assert hidden.shape == (1, 4, 32)
    assert np.all(np.isfinite(np.asarray(hidden)))


def test_custom_geometry_bert_trains(hf_dir, tmp_path):
    """A non-base DistilBERT (dim=32, 4 heads) must train end-to-end: the
    recovered bert_cfg drives the attention reshapes and the reward head is
    sized to the encoder's sentence-embedding width (R3MConfig.lang_dim) —
    previously both silently assumed distilbert-base geometry and crashed."""
    import jax
    import numpy as np

    from r3m_tpu.models.r3m import R3MConfig
    from r3m_tpu.prepare_language import prepare
    from r3m_tpu.training.trainer import create_train_state, make_train_step
    from r3m_tpu.training.workspace import load_bert_params

    out = str(tmp_path / "lang")
    prepare(hf_dir, out)
    params, bert_cfg = load_bert_params(os.path.join(out, "distilbert.npz"))

    mcfg = R3MConfig(
        size=18, langweight=1.0, tcnweight=1.0, image_size=32, bs=4,
        lang_dim=bert_cfg.dim,
    )
    state = create_train_state(mcfg, jax.random.PRNGKey(0))
    step = make_train_step(
        mcfg, bert_params=params, bert_cfg=bert_cfg, donate=False
    )
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.uniform(0, 255, (4, 5, 32, 32, 3)).astype(np.float32),
        "token_ids": rng.integers(0, len(VOCAB), (4, 6)).astype(np.int32),
        "attn_mask": np.ones((4, 6), np.int32),
        "lang_mask": np.ones((4,), np.float32),
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["full_loss"]))
    assert "rewloss" in metrics


def test_prepare_language_cli(hf_dir, tmp_path, capsys):
    from r3m_tpu.prepare_language import main

    out = str(tmp_path / "cli_lang")
    main(["--model", hf_dir, "--out", out])
    assert os.path.exists(os.path.join(out, "distilbert.npz"))
    assert os.path.exists(os.path.join(out, "vocab.txt"))
    assert "wrote" in capsys.readouterr().out
