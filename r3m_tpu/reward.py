"""Language-conditioned reward serving API.

Downstream users of the reference call ``model.module.get_reward(e0, es,
sentences)`` on a language-trained R3M (``/root/reference/r3m/models/
models_r3m.py:78-81``): the frozen DistilBERT encodes the instruction, the
trained `LanguageReward` MLP scores how much progress the (start, current)
embedding pair makes toward it. This module packages that capability for
inference — from a native training snapshot (which, unlike the stripped
`load_r3m` artifacts, still carries ``lang_rew``) or a reference torch
training snapshot (`from_torch_snapshot`).

    rm = R3MRewardModel.from_snapshot("snapshot.npz", bert_weights, vocab)
    r = rm.get_reward(e0, es, ["pick up the cup"] )   # embeddings path
    r = rm(images0, images_t, ["pick up the cup"])    # images path
    curve = rm.reward_curve(frames, "pick up the cup")  # one trajectory

Padding semantics matter: DistilBERT sentence embeddings mean-pool over ALL
tokens including padding (models_language.py:34), so the pad length changes
the embedding. `pad_mode="fixed"` pads to `lang_max_len` — matching THIS
framework's training pipeline (static shapes). `pad_mode="longest"` pads to
the longest sentence in the batch — the reference tokenizer's
``padding=True`` behavior (models_language.py:30), required for parity when
serving reference-trained heads (at the cost of one XLA recompile per
distinct batch length).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from r3m_tpu.models.distilbert import sentence_embedding
from r3m_tpu.models.language_reward import language_reward_apply
from r3m_tpu.models.r3m import R3MConfig, R3MEncoder
from r3m_tpu.text.tokenizer import WordPieceTokenizer


class R3MRewardModel:
    """Frozen (encoder + DistilBERT + LanguageReward) reward scorer."""

    def __init__(
        self,
        cfg: R3MConfig,
        params,
        batch_stats,
        bert_params,
        tokenizer: WordPieceTokenizer,
        lang_max_len: int = 32,
        pad_mode: str = "fixed",
        bert_cfg=None,
        precision: str = "parity",
    ):
        if "lang_rew" not in params:
            raise ValueError(
                "snapshot has no language head (trained with langweight=0?)"
            )
        if pad_mode not in ("fixed", "longest"):
            raise ValueError(f"pad_mode must be 'fixed'|'longest': {pad_mode!r}")
        self.cfg = cfg
        # coerce snapshot-loaded numpy trees to device arrays ONCE — passing
        # numpy leaves as jit args would re-upload all weights per call
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
        self.bert_params = jax.tree_util.tree_map(jnp.asarray, bert_params)
        self.tokenizer = tokenizer
        self.lang_max_len = lang_max_len
        self.pad_mode = pad_mode

        # Reuse the serving encoder (load_r3m's path): BN-folded forward.
        # precision="parity" (default, f32/HIGHEST) makes reward embeddings
        # bit-identical to what `load_r3m(...)(images)` returns for the same
        # weights; "fast" runs the image encode in bf16 for high-rate RL
        # reward loops (measured 4.0x/3.9x device rate at cosine >=0.9999,
        # BASELINE.md fast-serving row). BERT + the reward MLP stay f32
        # either way — they are a negligible share of the reward query.
        self._encoder = R3MEncoder(
            cfg, {"convnet": self.params["convnet"]}, self.batch_stats,
            precision=precision,
        )

        from r3m_tpu.models.distilbert import BASE

        bert_cfg = bert_cfg or BASE

        @jax.jit
        def _lang(bert_params, ids, mask):
            return sentence_embedding(bert_params, ids, mask, bert_cfg)

        @jax.jit
        def _reward_from_lang(params, e0, es, lang_emb):
            return language_reward_apply(params["lang_rew"], e0, es, lang_emb)

        self._lang = _lang
        self._reward_from_lang = _reward_from_lang

    @classmethod
    def from_snapshot(
        cls,
        snapshot_path: str,
        bert_weights: str,
        vocab_path: str,
        lang_max_len: Optional[int] = None,
        pad_mode: str = "fixed",
        precision: str = "parity",
    ) -> "R3MRewardModel":
        """Build from a native .npz training snapshot (config in metadata).

        `lang_max_len=None` recovers the value the training run padded to
        (snapshot metadata; default 32) — serving with a different pad
        length would silently shift the sentence-embedding distribution the
        reward head was trained on.
        """
        from r3m_tpu.checkpoint import load_snapshot, r3m_config_from_meta
        from r3m_tpu.training.workspace import load_bert_params

        tree, meta = load_snapshot(snapshot_path)
        # serving is always f32 regardless of the training compute dtype
        cfg = r3m_config_from_meta(meta, compute_dtype="float32")
        if lang_max_len is None:
            lang_max_len = int(meta.get("lang_max_len", 32))
        bert_params, bert_cfg = load_bert_params(bert_weights)
        return cls(
            cfg,
            params=tree["params"],
            batch_stats=tree.get("batch_stats", {}),
            bert_params=bert_params,
            bert_cfg=bert_cfg,
            tokenizer=WordPieceTokenizer(vocab_file=vocab_path),
            lang_max_len=lang_max_len,
            pad_mode=pad_mode,
            precision=precision,
        )

    @classmethod
    def from_torch_snapshot(
        cls,
        snapshot_path: str,
        bert_weights: Optional[str],
        vocab_path: str,
        pad_mode: str = "longest",
        precision: str = "parity",
    ) -> "R3MRewardModel":
        """Build from a REFERENCE torch training snapshot (snapshot.pt).

        Imports convnet + BN stats + the `lang_rew` MLP via the torch
        converter. `bert_weights=None` uses the DistilBERT EMBEDDED in the
        snapshot itself (`module.lang_enc.model.*` — the reference
        registers the frozen encoder as a submodule, models_r3m.py:70, so
        language-trained snapshots are self-contained apart from the
        tokenizer vocab); pass an .npz path to override. Defaults to
        `pad_mode="longest"` because the reference tokenizes with
        ``padding=True`` (models_language.py:30) and its mean-pool includes
        padding — fixed-length padding would score reference-trained heads
        on out-of-distribution sentence embeddings.
        """
        from r3m_tpu.checkpoint import load_torch_checkpoint
        from r3m_tpu.training.workspace import load_bert_params

        bundle = load_torch_checkpoint(snapshot_path, include_language=True)
        if bundle.get("lang_rew") is None:
            raise ValueError(
                f"{snapshot_path} carries no language-reward head"
            )
        bert_cfg = None
        if bert_weights is not None:
            bert_params, bert_cfg = load_bert_params(bert_weights)
        elif bundle.get("lang_enc") is not None:
            bert_params = bundle["lang_enc"]["params"]
            bert_cfg = bundle["lang_enc"]["cfg"]
        else:
            raise ValueError(
                f"{snapshot_path} embeds no lang_enc DistilBERT; pass "
                "bert_weights=<distilbert.npz> (see r3m-prepare-language)"
            )
        cfg = R3MConfig(
            size=bundle["size"],
            langweight=1.0,
            compute_dtype="float32",
            # a ViT's pos-embedding table fixes the crop size
            image_size=bundle.get("image_size", R3MConfig.image_size),
        )
        return cls(
            cfg,
            params={
                "convnet": bundle["convnet"]["params"],
                "lang_rew": bundle["lang_rew"],
            },
            batch_stats=bundle["convnet"]["batch_stats"],
            bert_params=bert_params,
            tokenizer=WordPieceTokenizer(vocab_file=vocab_path),
            pad_mode=pad_mode,
            bert_cfg=bert_cfg,
            precision=precision,
        )

    # -- reference-parity surface ------------------------------------------
    def embed(self, images) -> jax.Array:
        """NCHW [0,255] images -> [B, D] embeddings (the load_r3m path)."""
        obs = np.asarray(images, dtype=np.float32)
        if obs.ndim == 3:
            obs = obs[None]
        return self._encoder(obs)

    def _sentence_embeddings(self, sentences: Sequence[str]) -> jax.Array:
        max_len = None if self.pad_mode == "longest" else self.lang_max_len
        ids, mask = self.tokenizer.encode_batch(list(sentences), max_len)
        return self._lang(self.bert_params, jnp.asarray(ids), jnp.asarray(mask))

    def get_reward(self, e0, es, sentences: Sequence[str]) -> jax.Array:
        """Score (start, current) embedding pairs against instructions
        (models_r3m.py:78-81)."""
        lang_emb = self._sentence_embeddings(sentences)
        return self._reward_from_lang(
            self.params, jnp.asarray(e0), jnp.asarray(es), lang_emb
        )

    def __call__(self, images0, images_t, sentences: Sequence[str]) -> jax.Array:
        # one stacked [2B, ...] encoder pass: per-call dispatch + H2D
        # overhead dominates at robot-control batch sizes, so don't pay it
        # twice for two same-shaped image batches
        obs0 = np.asarray(images0, dtype=np.float32)
        obs_t = np.asarray(images_t, dtype=np.float32)
        if obs0.ndim == 3:
            obs0 = obs0[None]
        if obs_t.ndim == 3:
            obs_t = obs_t[None]
        if obs0.shape == obs_t.shape:
            both = self._encoder(np.concatenate([obs0, obs_t], axis=0))
            e0, es = both[: obs0.shape[0]], both[obs0.shape[0]:]
        else:
            e0, es = self._encoder(obs0), self._encoder(obs_t)
        return self.get_reward(e0, es, sentences)

    def reward_curve(self, frames, sentence: str) -> jax.Array:
        """Per-frame progress rewards along one trajectory.

        The paper's qualitative evaluation (arXiv:2203.12601 §4.3: reward
        curves over task videos): score every frame against the FIRST frame
        under one instruction, `r_t = R(e_0, e_t, l)`. `frames` is
        [T, C, H, W] in [0, 255]; returns [T] scores (index 0 is the
        degenerate (e_0, e_0) score — a natural baseline for the curve).
        One batched encoder pass; the instruction is tokenized and
        BERT-encoded ONCE and broadcast across frames.
        """
        emb = self.embed(frames)
        lang = self._sentence_embeddings([sentence])[0]
        lang_emb = jnp.broadcast_to(lang, (emb.shape[0], lang.shape[0]))
        e0 = jnp.broadcast_to(emb[0], emb.shape)
        return self._reward_from_lang(self.params, e0, emb, lang_emb)
