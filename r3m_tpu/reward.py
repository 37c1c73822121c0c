"""Language-conditioned reward serving API.

Downstream users of the reference call ``model.module.get_reward(e0, es,
sentences)`` on a language-trained R3M (``/root/reference/r3m/models/
models_r3m.py:78-81``): the frozen DistilBERT encodes the instruction, the
trained `LanguageReward` MLP scores how much progress the (start, current)
embedding pair makes toward it. This module packages that capability for
inference — from a native training snapshot (which, unlike the stripped
`load_r3m` artifacts, still carries ``lang_rew``) or a reference torch
training snapshot.

    rm = R3MRewardModel.from_snapshot("snapshot.npz", bert_weights, vocab)
    r = rm.get_reward(e0, es, ["pick up the cup"] )   # embeddings path
    r = rm(images0, images_t, ["pick up the cup"])    # images path
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from r3m_tpu.models.distilbert import sentence_embedding
from r3m_tpu.models.language_reward import language_reward_apply
from r3m_tpu.models.r3m import R3MConfig, r3m_embed
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
    ):
        if "lang_rew" not in params:
            raise ValueError(
                "snapshot has no language head (trained with langweight=0?)"
            )
        self.cfg = cfg
        # coerce snapshot-loaded numpy trees to device arrays ONCE — passing
        # numpy leaves as jit args would re-upload all weights per call
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
        self.bert_params = jax.tree_util.tree_map(jnp.asarray, bert_params)
        self.tokenizer = tokenizer
        self.lang_max_len = lang_max_len

        @jax.jit
        def _embed(params, batch_stats, obs):  # obs NCHW [0,255]
            x = jnp.transpose(obs, (0, 2, 3, 1))
            emb, _ = r3m_embed(cfg, params, batch_stats, x, train=False)
            return emb

        @jax.jit
        def _reward(params, bert_params, e0, es, ids, mask):
            le = sentence_embedding(bert_params, ids, mask)
            return language_reward_apply(params["lang_rew"], e0, es, le)

        self._embed = _embed
        self._reward = _reward

    @classmethod
    def from_snapshot(
        cls,
        snapshot_path: str,
        bert_weights: str,
        vocab_path: str,
        lang_max_len: int = 32,
    ) -> "R3MRewardModel":
        """Build from a native .npz training snapshot (config in metadata)."""
        from r3m_tpu.checkpoint import load_snapshot, r3m_config_from_meta
        from r3m_tpu.training.workspace import load_bert_params

        tree, meta = load_snapshot(snapshot_path)
        # serving is always f32 regardless of the training compute dtype
        cfg = r3m_config_from_meta(meta, compute_dtype="float32")
        return cls(
            cfg,
            params=tree["params"],
            batch_stats=tree.get("batch_stats", {}),
            bert_params=load_bert_params(bert_weights),
            tokenizer=WordPieceTokenizer(vocab_file=vocab_path),
            lang_max_len=lang_max_len,
        )

    # -- reference-parity surface ------------------------------------------
    def embed(self, images) -> jax.Array:
        """NCHW [0,255] images -> [B, D] embeddings."""
        obs = jnp.asarray(np.asarray(images, dtype=np.float32))
        if obs.ndim == 3:
            obs = obs[None]
        return self._embed(self.params, self.batch_stats, obs)

    def get_reward(self, e0, es, sentences: Sequence[str]) -> jax.Array:
        """Score (start, current) embedding pairs against instructions
        (models_r3m.py:78-81)."""
        ids, mask = self.tokenizer.encode_batch(
            list(sentences), self.lang_max_len
        )
        return self._reward(
            self.params,
            self.bert_params,
            jnp.asarray(e0),
            jnp.asarray(es),
            jnp.asarray(ids),
            jnp.asarray(mask),
        )

    def __call__(self, images0, images_t, sentences: Sequence[str]) -> jax.Array:
        return self.get_reward(
            self.embed(images0), self.embed(images_t), sentences
        )

    def reward_curve(self, frames, sentence: str) -> jax.Array:
        """Per-frame progress rewards along one trajectory.

        The paper's qualitative evaluation (arXiv:2203.12601 §4.3: reward
        curves over task videos): score every frame against the FIRST frame
        under one instruction, `r_t = R(e_0, e_t, l)`. `frames` is
        [T, C, H, W] in [0, 255]; returns [T] scores (index 0 is the
        degenerate (e_0, e_0) score — a natural baseline for the curve).
        One batched encoder pass + one batched MLP pass.
        """
        emb = self.embed(frames)
        e0 = jnp.broadcast_to(emb[0], emb.shape)
        return self.get_reward(e0, emb, [sentence] * int(emb.shape[0]))
