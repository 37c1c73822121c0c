"""ViT-B/32 visual encoder (HF `google/vit-base-patch32-224-in21k` arch).

The reference's ``size == 0`` branch builds this model via HF AutoModel
(``/root/reference/r3m/models/models_r3m.py:52-56``) — a latent-broken
path there (`AutoModel` is never imported, and the forward would return a
`BaseModelOutputWithPooling` object into tensor code). This rebuild makes
it actually trainable: the encoder returns the HF *pooler output*
(tanh(dense(CLS))), a [B, 768] embedding, matching `outdim = 768`.

Architecture: Conv 32x32/32 patch embed -> prepend CLS -> learned position
embeddings (50 tokens @ 224x224) -> 12 pre-LN transformer layers (12 heads,
dim 768, FFN 3072, exact GELU, LN eps 1e-12) -> final LN -> pooler.
Weight conversion from an HF torch state dict is provided for parity tests.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Pytree = Any


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 32
    dim: int = 768
    n_layers: int = 12
    n_heads: int = 12
    hidden_dim: int = 3072
    layer_norm_eps: float = 1e-12


B32 = ViTConfig()


def _linear_init(key, fan_in, fan_out, std=0.02):
    # NOTE: deliberately NOT shared with distilbert._linear_init (which
    # splits its key first) — golden-pin tests fix each backbone's seeded
    # random init, so unifying the key plumbing would shift pinned numerics
    # for zero functional gain (real weights always come from conversion).
    return {
        "w": jax.random.normal(key, (fan_in, fan_out)) * std,
        "b": jnp.zeros((fan_out,)),
    }


def _ln_init(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def vit_b32_init(key: jax.Array, cfg: ViTConfig = B32) -> Pytree:
    n_tokens = (cfg.image_size // cfg.patch_size) ** 2 + 1
    keys = jax.random.split(key, 4 + cfg.n_layers)
    params: Dict[str, Any] = {
        "patch": {
            # HWIO conv kernel, stride == kernel == patch_size
            "w": jax.random.normal(
                keys[0], (cfg.patch_size, cfg.patch_size, 3, cfg.dim)
            )
            * 0.02,
            "b": jnp.zeros((cfg.dim,)),
        },
        "cls": jax.random.normal(keys[1], (1, 1, cfg.dim)) * 0.02,
        "pos": jax.random.normal(keys[2], (1, n_tokens, cfg.dim)) * 0.02,
        "final_ln": _ln_init(cfg.dim),
        "pooler": _linear_init(keys[3], cfg.dim, cfg.dim),
    }
    layers: List[Dict[str, Any]] = []
    for i in range(cfg.n_layers):
        lk = jax.random.split(keys[4 + i], 6)
        layers.append(
            {
                "ln1": _ln_init(cfg.dim),
                "q": _linear_init(lk[0], cfg.dim, cfg.dim),
                "k": _linear_init(lk[1], cfg.dim, cfg.dim),
                "v": _linear_init(lk[2], cfg.dim, cfg.dim),
                "o": _linear_init(lk[3], cfg.dim, cfg.dim),
                "ln2": _ln_init(cfg.dim),
                "lin1": _linear_init(lk[4], cfg.dim, cfg.hidden_dim),
                "lin2": _linear_init(lk[5], cfg.hidden_dim, cfg.dim),
            }
        )
    params["layers"] = layers
    return params


# shared with DistilBERT: r3m_tpu/models/layers.py
from r3m_tpu.models.layers import dense as _dense, layer_norm as _layer_norm  # noqa: E402


def vit_b32_apply(
    params: Pytree,
    x: jax.Array,
    cfg: ViTConfig = B32,
    precision=None,
    compute_dtype=None,
    fused_attn: bool | str = False,
    fused_attn_interpret: bool | None = None,
    shard_mesh=None,
) -> jax.Array:
    """NHWC normalized images -> [B, dim] pooled embedding (HF pooler_output).

    `compute_dtype=jnp.bfloat16` runs matmuls/attention in bf16 on the MXU
    (params stay f32; LayerNorm statistics and softmax accumulate f32 via
    preferred_element_type). Output is always f32.

    `fused_attn=True` (or ``"batched"`` for the kernel's 3-D-dot lowering
    variant) routes QK^T -> softmax -> PV through the Pallas
    kernel (`r3m_tpu.ops.attention.fused_attention`), at the same
    `precision` as the einsum path: scores/probs stay in VMEM and the
    backward recomputes them. Same math as the einsum path to bf16/f32
    rounding. `fused_attn_interpret` forces/suppresses the kernel's
    interpret mode; the None default resolves it from the actual lowering
    platform via `jax.lax.platform_dependent` (TPU compiles the kernel,
    every other platform interprets), so AOT lowering for a non-default
    backend is safe without the explicit flag.

    `shard_mesh`: a `jax.sharding.Mesh` when this forward runs inside a
    batch-sharded (data-parallel) jitted program AND `fused_attn` is on.
    `pl.pallas_call` carries no GSPMD partitioning rule, so under a plain
    jit-with-shardings the kernel would force per-layer gathers to the
    full global batch; wrapping the call in `jax.shard_map` over the mesh
    axes keeps it per-shard — attention is per-sample, so the math is
    unchanged and the program's collectives are identical to the einsum
    path's (pinned by tests/test_train_step.py). Ignored on the einsum
    path, which GSPMD partitions cleanly by itself.
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    b = x.shape[0]
    patches = jax.lax.conv_general_dilated(
        x,
        params["patch"]["w"].astype(x.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    patches = patches + params["patch"]["b"].astype(x.dtype)
    tokens = jnp.reshape(patches, (b, -1, cfg.dim))  # row-major patch order (HF)
    cls = jnp.broadcast_to(params["cls"], (b, 1, cfg.dim)).astype(tokens.dtype)
    h = jnp.concatenate([cls, tokens], axis=1) + params["pos"].astype(x.dtype)

    if fused_attn:
        import functools

        from r3m_tpu.ops.attention import fused_attention

        def _attn(q, k, v, interpret):
            return fused_attention(
                q, k, v, cfg.n_heads,
                interpret=interpret,
                precision=precision,
                batched=fused_attn == "batched",
            )

        if fused_attn_interpret is None:
            # Resolve interpret mode from the ACTUAL lowering platform, not
            # a trace-time `jax.default_backend()` sniff: platform_dependent
            # specializes per compilation target, so AOT-lowering this step
            # for TPU from a CPU-default host (or vice versa) picks the
            # right kernel mode instead of baking in the wrong one.
            def attn_call(q, k, v):
                return jax.lax.platform_dependent(
                    q, k, v,
                    tpu=functools.partial(_attn, interpret=False),
                    default=functools.partial(_attn, interpret=True),
                )
        else:
            attn_call = functools.partial(
                _attn, interpret=fused_attn_interpret
            )

        if shard_mesh is not None:
            from jax.sharding import PartitionSpec as P

            # batch axis sharded over ALL mesh axes (matches
            # parallel.mesh.batch_sharded); q/k/v are per-sample, so the
            # kernel runs on each shard independently — no collectives.
            spec = P(shard_mesh.axis_names)
            # check_vma=False: pallas_call's out_shape carries no varying-
            # mesh-axes annotation, so the rep checker can't type it; the
            # wrap is per-sample by construction (no collectives to check).
            attn_call = jax.shard_map(
                attn_call,
                mesh=shard_mesh,
                in_specs=(spec, spec, spec),
                out_specs=spec,
                check_vma=False,
            )

    head_dim = cfg.dim // cfg.n_heads
    t = h.shape[1]
    for layer in params["layers"]:
        y = _layer_norm(h, layer["ln1"], cfg.layer_norm_eps)
        if fused_attn:
            ctx = attn_call(
                _dense(y, layer["q"], precision),
                _dense(y, layer["k"], precision),
                _dense(y, layer["v"], precision),
            )
        else:
            q = _dense(y, layer["q"], precision).reshape(
                b, t, cfg.n_heads, head_dim
            )
            k = _dense(y, layer["k"], precision).reshape(
                b, t, cfg.n_heads, head_dim
            )
            v = _dense(y, layer["v"], precision).reshape(
                b, t, cfg.n_heads, head_dim
            )
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, precision=precision,
                preferred_element_type=jnp.float32,
            ) / np.sqrt(head_dim)
            probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            ctx = jnp.einsum(
                "bhqk,bkhd->bqhd", probs, v, precision=precision,
                preferred_element_type=jnp.float32,
            ).astype(v.dtype).reshape(b, t, cfg.dim)
        h = h + _dense(ctx, layer["o"], precision)
        y = _layer_norm(h, layer["ln2"], cfg.layer_norm_eps)
        y = jax.nn.gelu(_dense(y, layer["lin1"], precision), approximate=False)
        h = h + _dense(y, layer["lin2"], precision)

    h = _layer_norm(h, params["final_ln"], cfg.layer_norm_eps)
    pooled = jnp.tanh(_dense(h[:, 0], params["pooler"], precision))
    return pooled.astype(jnp.float32)


def vit_config_from_state(sd) -> ViTConfig:
    """Infer the ViTConfig from an HF ViTModel state dict.

    Shapes fully determine the architecture except `n_heads` (head count
    never appears in parameter shapes); B32's 12 heads are assumed for
    dim 768 and `dim // 64` (the HF family ratio) otherwise.
    """
    import re

    layer_ids = [
        int(m.group(1))
        for k in sd
        for m in [re.match(r"encoder\.layer\.(\d+)\.", k)]
        if m
    ]
    if not layer_ids:
        # a bare max() on the empty generator raises an opaque ValueError
        raise ValueError(
            "state dict has no encoder.layer.* keys — expected an HF "
            "ViTModel layout (a truncated or differently-prefixed save?)"
        )
    n_layers = 1 + max(layer_ids)
    w = sd["embeddings.patch_embeddings.projection.weight"]  # OIHW
    dim, patch = int(w.shape[0]), int(w.shape[2])
    hidden = int(sd["encoder.layer.0.intermediate.dense.weight"].shape[0])
    n_tokens = int(sd["embeddings.position_embeddings"].shape[1])
    side = int(round((n_tokens - 1) ** 0.5))
    return ViTConfig(
        image_size=side * patch,
        patch_size=patch,
        dim=dim,
        n_layers=n_layers,
        n_heads=12 if dim == 768 else max(1, dim // 64),
        hidden_dim=hidden,
    )


def require_b32_geometry(cfg: ViTConfig) -> None:
    """Reject non-ViT-B/32 geometries at conversion time.

    Lives next to `vit_config_from_state` on purpose: that function's
    `n_heads = dim // 64` guess is unvalidated for non-768 dims, and the
    serving path (r3m_embed) hard-codes B/32 — the reference's only ViT
    (models_r3m.py:52-56). Keeping the guard beside the heuristic stops the
    assumption and its enforcement drifting apart.
    """
    geometry = (cfg.patch_size, cfg.dim, cfg.n_layers, cfg.hidden_dim)
    if geometry != (B32.patch_size, B32.dim, B32.n_layers, B32.hidden_dim):
        raise ValueError(
            "size==0 checkpoints must be ViT-B/32 (the reference's only "
            f"ViT, models_r3m.py:52-56); found patch/dim/layers/ffn = {geometry}"
        )


def convert_vit(sd, cfg: ViTConfig = B32) -> Pytree:
    """HF ViTModel state dict -> pytree (torch OIHW conv -> HWIO; [out,in] -> [in,out])."""

    # one converter law shared with the DistilBERT backbone (models/layers.py)
    from r3m_tpu.models.layers import convert_layer_norm, convert_linear
    from r3m_tpu.models.layers import torch_to_np as npa

    def lin(prefix):
        return convert_linear(sd, prefix)

    def ln(prefix):
        return convert_layer_norm(sd, prefix)

    params: Dict[str, Any] = {
        "patch": {
            "w": npa(
                sd["embeddings.patch_embeddings.projection.weight"]
            ).transpose(2, 3, 1, 0),
            "b": npa(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "cls": npa(sd["embeddings.cls_token"]),
        "pos": npa(sd["embeddings.position_embeddings"]),
        "final_ln": ln("layernorm"),
        "pooler": lin("pooler.dense"),
    }
    layers = []
    for i in range(cfg.n_layers):
        base = f"encoder.layer.{i}"
        layers.append(
            {
                "ln1": ln(f"{base}.layernorm_before"),
                "q": lin(f"{base}.attention.attention.query"),
                "k": lin(f"{base}.attention.attention.key"),
                "v": lin(f"{base}.attention.attention.value"),
                "o": lin(f"{base}.attention.output.dense"),
                "ln2": ln(f"{base}.layernorm_after"),
                "lin1": lin(f"{base}.intermediate.dense"),
                "lin2": lin(f"{base}.output.dense"),
            }
        )
    params["layers"] = layers
    return params


def export_vit(params: Pytree) -> Dict[str, np.ndarray]:
    """Inverse of `convert_vit`: pytree -> HF ViTModel state-dict naming.

    Lets a TPU-trained size==0 model round-trip into the reference's torch
    snapshot format (the size==0 branch stores the HF ViTModel as
    ``convnet`` — models_r3m.py:52-56, train_representation.py:123-130).
    """
    # share the torch-export layout conventions with the resnet/linear
    # exporters so a convention fix in convert.py covers this path too
    from r3m_tpu.convert import _conv_w_inv, export_linear

    sd: Dict[str, np.ndarray] = {}

    def lin(prefix, p):
        export_linear(p, prefix, sd)

    def ln(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"], np.float32)
        sd[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)

    sd["embeddings.patch_embeddings.projection.weight"] = _conv_w_inv(
        params["patch"]["w"]
    )
    sd["embeddings.patch_embeddings.projection.bias"] = np.asarray(
        params["patch"]["b"], np.float32
    )
    sd["embeddings.cls_token"] = np.asarray(params["cls"], np.float32)
    sd["embeddings.position_embeddings"] = np.asarray(params["pos"], np.float32)
    ln("layernorm", params["final_ln"])
    lin("pooler.dense", params["pooler"])
    for i, layer in enumerate(params["layers"]):
        base = f"encoder.layer.{i}"
        ln(f"{base}.layernorm_before", layer["ln1"])
        lin(f"{base}.attention.attention.query", layer["q"])
        lin(f"{base}.attention.attention.key", layer["k"])
        lin(f"{base}.attention.attention.value", layer["v"])
        lin(f"{base}.attention.output.dense", layer["o"])
        ln(f"{base}.layernorm_after", layer["ln2"])
        lin(f"{base}.intermediate.dense", layer["lin1"])
        lin(f"{base}.output.dense", layer["lin2"])
    return sd
