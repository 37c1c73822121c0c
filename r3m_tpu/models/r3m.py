"""R3M model: visual encoder + similarity + language-reward container.

Functional JAX counterpart of the reference's ``R3M(nn.Module)``
(``/root/reference/r3m/models/models_r3m.py:21-107``): a ResNet-18/34/50
(or ViT-B/32 for ``size == 0``) backbone whose output is the pooled
embedding, ImageNet (or 0.5/0.5 for ViT) normalization of [0,255] inputs,
a −L2 / cosine similarity (`sim`, models_r3m.py:102-107), and — when
``langweight > 0`` — the language-reward MLP head. Loss weights live in
the config; parameters/batch-stats are pytrees.

`R3MEncoder` at the bottom is the user-facing callable returned by
`r3m_tpu.load_r3m`: it accepts NCHW uint8-range arrays like the reference
model and returns embeddings, with the whole preprocess+forward jitted.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from r3m_tpu.models.language_reward import (
    language_reward_apply,
    language_reward_init,
)
from r3m_tpu.models.resnet import resnet_apply, resnet_init, resnet_out_dim
from r3m_tpu.ops.image import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    VIT_MEAN,
    VIT_STD,
    nchw_to_nhwc,
    r3m_preprocess,
)

Pytree = Any

LANG_DIM = 768  # DistilBERT hidden size (models_language.py:21)


@dataclasses.dataclass(frozen=True)
class R3MConfig:
    """Static model/loss configuration (hashable; safe to close over in jit).

    Field names and defaults mirror the reference's constructor arguments
    and `cfgs/config_rep.yaml` agent block.
    """

    size: int = 34  # 18 | 34 | 50 | 0 (ViT-B/32)
    hidden_dim: int = 1024
    l2weight: float = 1e-5
    l1weight: float = 1e-5
    langweight: float = 0.0
    tcnweight: float = 1.0
    l2dist: bool = True
    num_negatives: int = 3
    lr: float = 1e-4
    bs: int = 32
    compute_dtype: str = "float32"  # "bfloat16" for max-throughput training
    image_size: int = 224  # training/eval crop size (224 in the reference)
    # "adam" = reference parity (models_r3m.py:76). "lars" = layer-wise
    # trust-ratio scaling for pod-scale global batches (Goyal et al. /
    # "ResNet-50 in 15 minutes"-style large-batch training), where plain
    # Adam at the reference lr degrades.
    optimizer: str = "adam"
    weight_decay: float = 0.0  # lars only; adam matches torch (none)
    # "conv_saved" reruns the elementwise BN/ReLU passes in the backward
    # instead of storing post-activation copies (resnet_apply docstring);
    # measured lever, see BASELINE.md. ResNet backbones only.
    remat: str = "none"
    # sentence-embedding width the reward head consumes; 768 for the
    # reference's distilbert-base (models_language.py:21) — override only
    # when training against a custom-geometry DistilBERT snapshot
    lang_dim: int = LANG_DIM
    # Training-time BN parameter layout: pack the ~100 per-layer [C] BN
    # vectors (plus their Adam moments) into contiguous per-role arrays so
    # the jitted step streams a few ~100 KB buffers instead of thousands of
    # ~1 KB ones (measured copy storm, BASELINE.md). Identical math (results
    # agree to f32 rounding); snapshots stay canonical. ResNet + Adam only:
    # LARS's per-array trust ratio would change under concatenation, so the
    # trainer ignores this flag for optimizer="lars".
    packed_bn: bool = True
    # ViT-only: route attention through the fused Pallas kernel
    # (ops/attention.py) — scores/probs stay in VMEM, backward recomputes
    # them. "auto" | False | True | "batched". "auto" (default) resolves
    # per call: the "batched" 3-D-dot lowering for TRAINING (measured
    # accept on the real chip — +15-20% end-to-end over the einsum path,
    # BASELINE.md round-4 ViT audit) and the einsum path for PARITY
    # serving (HIGHEST-precision f32 inference stays on the XLA lowering
    # the golden pins and torch-cosine checks were taken with). FAST
    # serving (R3MEncoder precision="fast", already bf16) resolves "auto"
    # to the batched kernel instead — measured +8.2% forward-only at
    # identical cosine (BASELINE.md fast-serving-attention row). True = the
    # per-element 2-D unroll lowering (measured: faster fwd, slower bwd —
    # net negative for training; kept as the tested variant). The kernel's
    # interpret mode resolves from the ACTUAL lowering platform
    # (`jax.lax.platform_dependent` in vit_b32_apply), so AOT-lowering for
    # a non-default backend is safe with "auto".
    vit_fused_attn: Any = "auto"

    def __post_init__(self):
        if self.size == 0 and self.remat != "none":
            # the remat policy names resnet checkpoint tags; silently
            # ignoring it on ViT would no-op a user's memory lever
            raise ValueError(
                "remat is a ResNet-only activation-memory lever; "
                f"remat={self.remat!r} has no effect on size=0 (ViT-B/32)"
            )
        if self.vit_fused_attn not in ("auto", False, True, "batched"):
            raise ValueError(
                "vit_fused_attn must be 'auto', false, true, or 'batched'; "
                f"got {self.vit_fused_attn!r}"
            )
        if self.size != 0 and self.vit_fused_attn not in (False, "auto"):
            raise ValueError(
                "vit_fused_attn is a ViT-only lever; it has no effect on "
                f"size={self.size} (ResNet has no attention)"
            )

    def resolved_fused_attn(self, train: bool):
        """The attention lowering `r3m_embed` actually uses.

        "auto": the measured-winner "batched" kernel for the training
        step, the einsum path for inference (see the field comment).
        """
        if self.size != 0:
            return False
        if self.vit_fused_attn == "auto":
            return "batched" if train else False
        return self.vit_fused_attn

    @property
    def out_dim(self) -> int:
        if self.size == 0:
            return 768  # ViT-B/32
        return resnet_out_dim(self.size)

    @property
    def resize_to(self) -> int:
        """Pre-crop resize edge: torchvision's Resize(256)+CenterCrop(224)
        serving law scaled to the configured crop (models_r3m.py:90)."""
        return max(1, round(self.image_size * 256 / 224))

    @property
    def norm_stats(self) -> Tuple[Tuple[float, ...], Tuple[float, ...]]:
        if self.size == 0:
            return VIT_MEAN, VIT_STD
        return IMAGENET_MEAN, IMAGENET_STD

    @property
    def jnp_compute_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


def r3m_init(key: jax.Array, cfg: R3MConfig) -> Dict[str, Pytree]:
    """Initialize all trainable state: {"params": ..., "batch_stats": ...}."""
    k_enc, k_rew = jax.random.split(key)
    if cfg.size == 0:
        import dataclasses as _dc

        from r3m_tpu.models.vit import B32, vit_b32_init

        if cfg.image_size % B32.patch_size:
            raise ValueError(
                f"ViT-B/32 needs image_size divisible by {B32.patch_size}, "
                f"got {cfg.image_size}"
            )
        # position-embedding table must match the configured input size
        enc_params = vit_b32_init(
            k_enc, _dc.replace(B32, image_size=cfg.image_size)
        )
        batch_stats: Pytree = {}
    else:
        enc_params, batch_stats = resnet_init(k_enc, cfg.size)
    params: Dict[str, Pytree] = {"convnet": enc_params}
    if cfg.langweight > 0.0:
        params["lang_rew"] = language_reward_init(
            k_rew, cfg.out_dim, cfg.hidden_dim, cfg.lang_dim
        )
    return {"params": params, "batch_stats": batch_stats}


def r3m_embed(
    cfg: R3MConfig,
    params: Pytree,
    batch_stats: Pytree,
    obs: jax.Array,
    *,
    train: bool = False,
    precision=None,
    prenormalized: bool = False,
    fused_attn_interpret: Optional[bool] = None,
    shard_mesh=None,
) -> Tuple[jax.Array, Pytree]:
    """Images -> embeddings (reference `forward`, models_r3m.py:84-100).

    `obs`: NHWC float/int in [0, 255]. Applies the shape-dependent
    preprocess, runs the backbone, returns ([B, out_dim] f32, new stats).

    `prenormalized=True` skips the /255 + mean/std preprocess: the caller
    already emitted encoder-input-form frames (the augmentation stage
    folds normalization into its crop weights — `data/augment.py`).

    `shard_mesh`: pass the data-parallel mesh when this call sits inside a
    batch-sharded jitted step and the ViT fused-attention kernel is active
    — the kernel is wrapped in `jax.shard_map` over the mesh so it stays
    per-shard under SPMD (vit_b32_apply docstring). No effect on ResNet or
    the einsum attention path.
    """
    if prenormalized:
        x = obs
    else:
        mean, std = cfg.norm_stats
        x = r3m_preprocess(
            obs,
            mean,
            std,
            crop_size=cfg.image_size,
            resize_to=cfg.resize_to,
        )
    if cfg.size == 0:
        import math

        from r3m_tpu.models.vit import vit_b32_apply

        fused = cfg.resolved_fused_attn(train)
        if fused and shard_mesh is not None:
            # shard_map requires the batch divisible by the total device
            # count (the kernel spec shards over ALL mesh axes). The einsum
            # path has no such constraint — GSPMD handles uneven shards —
            # so "auto" degrades to it instead of failing at trace time;
            # an EXPLICIT kernel request gets a clear error, not a silent
            # betrayal of the setting.
            n_dev = math.prod(shard_mesh.shape.values())
            if x.shape[0] % n_dev:
                if cfg.vit_fused_attn == "auto":
                    fused = False
                else:
                    raise ValueError(
                        f"vit_fused_attn={cfg.vit_fused_attn!r}: the fused "
                        f"attention kernel runs under jax.shard_map, which "
                        f"needs the flat frame batch ({x.shape[0]}) "
                        f"divisible by the mesh's {n_dev} devices; pick a "
                        "divisible batch size or set vit_fused_attn='auto' "
                        "to fall back to the einsum path"
                    )
        feats = vit_b32_apply(
            params["convnet"], x, precision=precision,
            compute_dtype=cfg.jnp_compute_dtype,
            fused_attn=fused,
            fused_attn_interpret=fused_attn_interpret,
            shard_mesh=shard_mesh if fused else None,
        )
        return feats, batch_stats
    feats, new_stats = resnet_apply(
        params["convnet"],
        batch_stats,
        x,
        size=cfg.size,
        train=train,
        compute_dtype=cfg.jnp_compute_dtype,
        precision=precision,
        remat=cfg.remat,
    )
    return feats, new_stats


def safe_l2_norm(x: jax.Array, axis: int = -1) -> jax.Array:
    """L2 norm with exact forward and a zero subgradient at x == 0.

    Plain `jnp.linalg.norm` has NaN gradient at 0 (0/0); torch defines the
    subgradient there as 0, which the reference relies on — its shuffled
    negatives `sim(es0, es0[randperm])` hit exact-zero differences whenever
    the permutation has a fixed point (trainer.py:135-139).
    """
    sq = jnp.sum(x * x, axis=axis)
    is_zero = sq == 0
    return jnp.where(is_zero, 0.0, jnp.sqrt(jnp.where(is_zero, 1.0, sq)))


def sim(cfg: R3MConfig, a: jax.Array, b: jax.Array) -> jax.Array:
    """−L2 distance or cosine similarity over the last axis (models_r3m.py:102-107).

    Cosine uses torch **1.7.1** semantics (the version the reference pins,
    r3m_base.yaml:60): dot(a,b) / max(||a||·||b||, eps) — the clamp is on
    the norm PRODUCT, which matters for small-but-nonzero embeddings the L1
    penalty pushes toward, and makes exactly-zero embeddings yield 0 rather
    than NaN. (torch >= 1.8 clamps each norm separately.)
    """
    if cfg.l2dist:
        return -safe_l2_norm(a - b, axis=-1)
    eps = 1e-8
    dot = jnp.sum(a * b, axis=-1)
    # safe_l2_norm, not jnp.linalg.norm: an exactly-zero embedding (ReLU
    # output under the L1 penalty) must get torch's 0 subgradient, not 0/0
    denom = safe_l2_norm(a, axis=-1) * safe_l2_norm(b, axis=-1)
    return dot / jnp.maximum(denom, eps)


def get_reward(
    cfg: R3MConfig,
    params: Pytree,
    e0: jax.Array,
    es: jax.Array,
    lang_emb: jax.Array,
) -> jax.Array:
    """Score (start, later, sentence-embedding) triples (models_r3m.py:78-81).

    Unlike the reference, the sentence embedding is precomputed once per
    batch (the frozen DistilBERT pass) instead of re-encoded per call.
    """
    return language_reward_apply(params["lang_rew"], e0, es, lang_emb)


class R3MEncoder:
    """User-facing inference module returned by `load_r3m`.

    Mimics the reference's DataParallel-wrapped module call signature:
    input NCHW (torch layout) float/uint8 in [0, 255], any spatial size
    (non-224 inputs get Resize(256)+CenterCrop(224)); output [B, out_dim]
    embeddings. Forward is jitted per input shape.

    `mesh`: optional `jax.sharding.Mesh` for multi-chip batch serving —
    weights replicate, the input batch shards on axis 0, and GSPMD runs
    the forward data-parallel (the serving analogue of the reference's
    DataParallel wrap, r3m/__init__.py:72). Batch size must divide by the
    mesh size.

    `precision`: `"parity"` (default) is the `load_r3m` law — f32 with
    HIGHEST-precision matmuls, the lowering every golden pin and
    torch-cosine check was taken with. `"fast"` runs the same BN-folded
    forward in bfloat16 at the backend-default MXU precision for
    throughput-critical serving (reward scoring inside an RL loop);
    embeddings come back as f32 and agree with the parity path to bf16
    rounding (cosine ≥ 0.9999 measured — BASELINE.md round-4 fast-serving
    row; pinned by tests/test_serving_precision.py).
    """

    def __init__(
        self, cfg: R3MConfig, params: Pytree, batch_stats: Pytree, mesh=None,
        precision: str = "parity",
    ):
        if precision not in ("parity", "fast"):
            raise ValueError(
                f"precision must be 'parity' or 'fast', got {precision!r}"
            )
        self.cfg = cfg
        self.precision = precision
        self.mesh = mesh
        if mesh is not None:
            from r3m_tpu.parallel.mesh import replicate

            self.params = replicate(mesh, params)
            self.batch_stats = replicate(mesh, batch_stats)
        else:
            # snapshot loaders hand back numpy pytrees; passing numpy leaves
            # as jit args would re-upload all weights on every call
            self.params = jax.tree_util.tree_map(jnp.asarray, params)
            self.batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
        self.module = self  # DataParallel-compat alias (ref accesses .module)

        # "fast" trades HIGHEST-precision f32 matmuls for bf16 at the
        # backend default; the fold/preprocess stay f32 (exact), only the
        # conv/matmul stack runs in the reduced dtype, and the embedding is
        # cast back to f32 at the boundary.
        fast = precision == "fast"
        mm_precision = None if fast else jax.lax.Precision.HIGHEST
        # attention lowering the serving forward actually uses (ViT only;
        # None on ResNet — no attention). Set below for the ViT branch.
        self.vit_serving_attn = None

        if cfg.size != 0:
            # Serving path: fold eval-mode BN into conv weights once — same
            # math, no per-layer normalize passes at inference.
            from r3m_tpu.models.resnet import fold_batchnorm, resnet_apply_folded

            mean, std = cfg.norm_stats

            @jax.jit
            def _fwd_folded(folded, obs_nchw):
                obs = nchw_to_nhwc(obs_nchw)
                x = r3m_preprocess(
                    obs, mean, std, crop_size=cfg.image_size,
                    resize_to=cfg.resize_to,
                )
                out = resnet_apply_folded(
                    folded, x, size=cfg.size,
                    compute_dtype=jnp.bfloat16 if fast else None,
                    precision=mm_precision,
                )
                return out.astype(jnp.float32)

            self._folded = None
            self._folded_src = None  # strong refs => `is` checks are safe

            def _fwd(p, s, obs):
                # torch-style weight swaps (enc.params = ..., or
                # enc.params["convnet"] = ...) must not serve stale folded
                # weights. Strong references to the folded-from objects make
                # the identity comparison immune to id reuse. Mutations
                # deeper than the convnet subtree require refold().
                src = (self.params, self.params.get("convnet"), self.batch_stats)
                if self._folded_src is None or any(
                    a is not b for a, b in zip(src, self._folded_src)
                ):
                    self.refold()
                return _fwd_folded(self._folded, obs)

            self._fwd = _fwd
        else:
            # Fast-mode ViT serving resolves "auto" to the batched Pallas
            # kernel: the forward-only lowerings measured +8.2% over the
            # einsum path in bf16 (9,021 vs 8,333 f/s device-resident,
            # identical fast-vs-parity cosine — BASELINE.md round-4
            # fast-serving-attention row). PARITY serving keeps einsum
            # ("auto" at train=False) — the f32/HIGHEST lowering the golden
            # pins were taken with. Explicit vit_fused_attn values pass
            # through in both modes.
            # Under a serving mesh the kernel survives sharding: pallas_call
            # has no GSPMD rule, so every kernel lowering (auto-fast or
            # explicit) is shard_map-wrapped over the mesh's batch axes —
            # attention is per-sample, so per-shard execution is exact and
            # collective-free (vit_b32_apply docstring).
            serve_fused = cfg.vit_fused_attn
            if fast and serve_fused == "auto":
                serve_fused = "batched"
            self.vit_serving_attn = (
                cfg.resolved_fused_attn(train=False)
                if serve_fused == "auto"
                else serve_fused
            )
            serve_cfg = (
                dataclasses.replace(
                    cfg, compute_dtype="bfloat16", vit_fused_attn=serve_fused
                )
                if fast
                else cfg
            )
            attn_mesh = mesh if self.vit_serving_attn else None

            @jax.jit
            def _fwd(params, batch_stats, obs_nchw):
                obs = nchw_to_nhwc(obs_nchw)
                emb, _ = r3m_embed(
                    serve_cfg,
                    params,
                    batch_stats,
                    obs,
                    train=False,
                    precision=mm_precision,
                    shard_mesh=attn_mesh,
                )
                return emb.astype(jnp.float32)

            self._fwd = _fwd

    def refold(self):
        """Recompute the BN-folded serving weights from current params."""
        if self.cfg.size == 0:
            return  # ViT path folds nothing
        from r3m_tpu.models.resnet import fold_batchnorm

        self._folded = fold_batchnorm(
            self.params["convnet"], self.batch_stats, self.cfg.size
        )
        self._folded_src = (
            self.params, self.params.get("convnet"), self.batch_stats
        )

    @property
    def outdim(self) -> int:
        return self.cfg.out_dim

    def __call__(self, obs, num_ims: int = 1, obs_shape=None) -> jax.Array:
        """NCHW [0,255] images -> [B, out_dim]. `num_ims`/`obs_shape` are
        accepted for reference-signature compatibility (models_r3m.py:84)
        — shape handling here is automatic."""
        if not isinstance(obs, (np.ndarray, jax.Array)):
            # torch tensors / lists; an already-on-device jax.Array must NOT
            # round-trip through host memory just for the shape checks below
            obs = np.asarray(obs)
        if obs.ndim == 3:
            obs = obs[None]
        if obs.ndim != 4 or obs.shape[1] != 3:
            hint = (
                " (input looks channels-last — this API takes torch NCHW layout)"
                if obs.ndim == 4 and obs.shape[-1] == 3
                else ""
            )
            raise ValueError(
                f"expected NCHW [B, 3, H, W] images, got {tuple(obs.shape)}{hint}"
            )
        if self.mesh is not None:
            from r3m_tpu.parallel.mesh import batch_sharded

            n = self.mesh.devices.size
            if obs.shape[0] % n:
                raise ValueError(
                    f"batch {obs.shape[0]} not divisible by the {n}-device "
                    "serving mesh (pad the batch or drop mesh=)"
                )
            # device_put straight from host memory: each chip receives only
            # its 1/n batch slice (an intermediate jnp.asarray would commit
            # the WHOLE batch to device 0's HBM first, then redistribute)
            obs = jax.device_put(obs, batch_sharded(self.mesh))
        else:
            obs = jnp.asarray(obs)
        return self._fwd(self.params, self.batch_stats, obs)

    def eval(self):  # torch-API compat no-ops
        return self

    def to(self, *_args, **_kw):
        return self
