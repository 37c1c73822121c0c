"""Frozen DistilBERT sentence encoder in JAX.

TPU-native equivalent of the reference's `LangEncoder`
(``/root/reference/r3m/models/models_language.py:13-35``): a frozen
pretrained ``distilbert-base-uncased`` whose ``last_hidden_state`` is
mean-pooled over the token axis — deliberately including padding tokens,
because the reference pools with ``.mean(1)`` over the padded batch
(models_language.py:34) and that choice affects loss parity.

Architecture (distilbert-base-uncased): vocab 30522, dim 768, 6 layers,
12 heads, FFN 3072, post-LayerNorm (eps 1e-12), exact (erf) GELU, learned
position embeddings, no token-type embeddings. Runs in eval mode only
(dropout off) — the reference never fine-tunes it (torch.no_grad, :29).

Weight conversion from a HuggingFace torch state dict is provided here
(`convert_distilbert`); the tokenizer lives in `r3m_tpu.text.tokenizer`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DistilBertConfig:
    vocab_size: int = 30522
    dim: int = 768
    n_layers: int = 6
    n_heads: int = 12
    hidden_dim: int = 3072
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12


BASE = DistilBertConfig()

Pytree = Any


# ---------------------------------------------------------------------------
# Init (random — used by parity tests; real weights come from conversion)
# ---------------------------------------------------------------------------


def _linear_init(key, fan_in, fan_out, std=0.02):
    kw, _ = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (fan_in, fan_out)) * std,
        "b": jnp.zeros((fan_out,)),
    }


def _ln_init(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def distilbert_init(key, cfg: DistilBertConfig = BASE) -> Pytree:
    keys = jax.random.split(key, 2 + cfg.n_layers)
    params: Dict[str, Any] = {
        "embeddings": {
            "word": jax.random.normal(keys[0], (cfg.vocab_size, cfg.dim)) * 0.02,
            "pos": jax.random.normal(keys[1], (cfg.max_position_embeddings, cfg.dim))
            * 0.02,
            "ln": _ln_init(cfg.dim),
        }
    }
    layers: List[Dict[str, Any]] = []
    for i in range(cfg.n_layers):
        lk = jax.random.split(keys[2 + i], 6)
        layers.append(
            {
                "q": _linear_init(lk[0], cfg.dim, cfg.dim),
                "k": _linear_init(lk[1], cfg.dim, cfg.dim),
                "v": _linear_init(lk[2], cfg.dim, cfg.dim),
                "o": _linear_init(lk[3], cfg.dim, cfg.dim),
                "sa_ln": _ln_init(cfg.dim),
                "lin1": _linear_init(lk[4], cfg.dim, cfg.hidden_dim),
                "lin2": _linear_init(lk[5], cfg.hidden_dim, cfg.dim),
                "out_ln": _ln_init(cfg.dim),
            }
        )
    params["layers"] = layers
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


# shared with ViT: r3m_tpu/models/layers.py (f32-stats LN is an exact no-op
# on this frozen f32 path)
from r3m_tpu.models.layers import dense as _dense, layer_norm as _layer_norm  # noqa: E402


def distilbert_apply(
    params: Pytree,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: DistilBertConfig = BASE,
) -> jax.Array:
    """[B, T] int32 ids + [B, T] {0,1} mask -> last_hidden_state [B, T, dim].

    Matches HF DistilBertModel eval-mode numerics: additive −inf (finfo.min)
    masking of attention scores at padded KEY positions, softmax in f32.
    """
    b, t = input_ids.shape
    max_pos = params["embeddings"]["pos"].shape[0]
    if t > max_pos:
        # XLA clamps out-of-bounds gathers, so positions beyond the table
        # would all silently reuse the last row (quietly wrong embeddings)
        # where HF/torch raises — fail loudly instead. t is static under
        # jit, so this is a trace-time check.
        raise ValueError(
            f"sequence length {t} exceeds the position-embedding table "
            f"({max_pos}, cfg.max_position_embeddings) — truncate or "
            "retokenize with a smaller lang_max_len"
        )
    pos_ids = jnp.arange(t)[None, :]
    x = params["embeddings"]["word"][input_ids] + params["embeddings"]["pos"][pos_ids]
    x = _layer_norm(x, params["embeddings"]["ln"], cfg.layer_norm_eps)

    head_dim = cfg.dim // cfg.n_heads
    # [B, 1, 1, T] additive mask on key positions
    neg = jnp.finfo(jnp.float32).min
    add_mask = jnp.where(attention_mask[:, None, None, :] == 0, neg, 0.0)

    for layer in params["layers"]:
        q = _dense(x, layer["q"]).reshape(b, t, cfg.n_heads, head_dim)
        k = _dense(x, layer["k"]).reshape(b, t, cfg.n_heads, head_dim)
        v = _dense(x, layer["v"]).reshape(b, t, cfg.n_heads, head_dim)
        scores = (
            jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
            / np.sqrt(head_dim)
        )
        scores = scores + add_mask
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
        ).reshape(b, t, cfg.dim)
        x = _layer_norm(x + _dense(ctx, layer["o"]), layer["sa_ln"], cfg.layer_norm_eps)
        h = jax.nn.gelu(_dense(x, layer["lin1"]), approximate=False)
        x = _layer_norm(x + _dense(h, layer["lin2"]), layer["out_ln"], cfg.layer_norm_eps)
    return x


def sentence_embedding(
    params: Pytree,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: DistilBertConfig = BASE,
) -> jax.Array:
    """Reference pooling: plain mean over ALL tokens (padding included).

    WARNING: because padding tokens participate, the embedding of a sentence
    depends on the padded length — exactly as in the reference
    (models_language.py:30-34, tokenizer pads to the longest sentence in the
    batch). Callers must pad consistently for reproducibility; the training
    pipeline pads to a fixed `lang_max_len` so results are batch-independent.
    """
    h = distilbert_apply(params, input_ids, attention_mask, cfg)
    return jnp.mean(h, axis=1)


# ---------------------------------------------------------------------------
# HF torch state-dict conversion
# ---------------------------------------------------------------------------


def _normalize_hf_state(sd):
    """Accept DistilBertFor*-head saves: the bare encoder lives under a
    "distilbert." prefix there — strip it so the plain DistilBertModel
    layout applies everywhere downstream."""
    if "embeddings.word_embeddings.weight" not in sd and any(
        k.startswith("distilbert.") for k in sd
    ):
        return {
            k[len("distilbert."):]: v
            for k, v in sd.items()
            if k.startswith("distilbert.")
        }
    return sd


def distilbert_config_from_state(sd, n_heads: int = 12) -> DistilBertConfig:
    """Infer the architecture of an HF DistilBertModel state dict.

    Every dimension except `n_heads` is determined by tensor shapes;
    `n_heads` is not shape-recoverable (default: distilbert-base's 12,
    the only architecture the reference ever loads,
    models_language.py:18-21).
    """
    import re

    sd = _normalize_hf_state(sd)
    vocab, dim = sd["embeddings.word_embeddings.weight"].shape
    max_pos = sd["embeddings.position_embeddings.weight"].shape[0]
    layer_ids = [
        int(m.group(1))
        for k in sd
        if (m := re.match(r"transformer\.layer\.(\d+)\.", k))
    ]
    if not layer_ids:
        raise ValueError(
            "state dict has no transformer.layer.* keys — expected an HF "
            "DistilBertModel layout (embeddings.* + transformer.layer.N.*); "
            f"got keys like {sorted(sd)[:3]}"
        )
    n_layers = 1 + max(layer_ids)
    hidden = sd["transformer.layer.0.ffn.lin1.weight"].shape[0]
    return DistilBertConfig(
        vocab_size=int(vocab),
        dim=int(dim),
        n_layers=int(n_layers),
        n_heads=n_heads,
        hidden_dim=int(hidden),
        max_position_embeddings=int(max_pos),
    )


def config_from_params(params: Pytree, n_heads: int = 12) -> DistilBertConfig:
    """Infer the architecture of a CONVERTED pytree (see distilbert_init).

    Same shape-inference as `distilbert_config_from_state` but over the
    framework's pytree layout; `n_heads` is not shape-recoverable (default:
    distilbert-base's 12 — prefer the `bert_config` snapshot metadata
    written by prepare_language when present)."""
    vocab, dim = np.shape(params["embeddings"]["word"])
    max_pos = np.shape(params["embeddings"]["pos"])[0]
    hidden = np.shape(params["layers"][0]["lin1"]["w"])[1]
    return DistilBertConfig(
        vocab_size=int(vocab),
        dim=int(dim),
        n_layers=len(params["layers"]),
        n_heads=n_heads,
        hidden_dim=int(hidden),
        max_position_embeddings=int(max_pos),
    )


def convert_distilbert(sd, cfg: DistilBertConfig = BASE) -> Pytree:
    """HF DistilBertModel state dict -> pytree (torch [out,in] -> [in,out])."""
    sd = _normalize_hf_state(sd)

    # one converter law shared with the ViT backbone (models/layers.py)
    from r3m_tpu.models.layers import convert_layer_norm, convert_linear
    from r3m_tpu.models.layers import torch_to_np as npa

    def lin(prefix):
        return convert_linear(sd, prefix)

    def ln(prefix):
        return convert_layer_norm(sd, prefix)

    params: Dict[str, Any] = {
        "embeddings": {
            "word": npa(sd["embeddings.word_embeddings.weight"]),
            "pos": npa(sd["embeddings.position_embeddings.weight"]),
            "ln": ln("embeddings.LayerNorm"),
        }
    }
    layers = []
    for i in range(cfg.n_layers):
        base = f"transformer.layer.{i}"
        layers.append(
            {
                "q": lin(f"{base}.attention.q_lin"),
                "k": lin(f"{base}.attention.k_lin"),
                "v": lin(f"{base}.attention.v_lin"),
                "o": lin(f"{base}.attention.out_lin"),
                "sa_ln": ln(f"{base}.sa_layer_norm"),
                "lin1": lin(f"{base}.ffn.lin1"),
                "lin2": lin(f"{base}.ffn.lin2"),
                "out_ln": ln(f"{base}.output_layer_norm"),
            }
        )
    params["layers"] = layers
    return params
