"""Single fused train/eval step: encode -> losses -> Adam, under one jit.

TPU-native counterpart of the reference's `Trainer.update`
(``/root/reference/r3m/trainer.py:25-162``) + the Adam optimizer owned by
the model (``models_r3m.py:76``). The whole step — 5-frame batched ResNet
encode, frozen DistilBERT sentence embedding, batched language/TCN
InfoNCE, backward, Adam — is ONE jitted program, so XLA fuses
preprocessing into the first conv, overlaps the frozen BERT pass with the
encoder, and (under a mesh) inserts ICI collectives for the global-batch
negatives and gradient psums.

Parallelism: the step is written as a *global-batch* program. With a
`jax.sharding.Mesh`, parameters are replicated and the batch is sharded on
axis 0 (`r3m_tpu.parallel.mesh`); GSPMD partitions the encoder along the
batch and all-gathers embeddings where the cross-video permutations need
them — reproducing DataParallel's compute-loss-on-gathered-batch semantics
(train_representation.py:29-31) without a loss-code change.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from r3m_tpu.data.augment import random_resized_crop_clips
from r3m_tpu.losses import draw_permutations, r3m_loss
from r3m_tpu.models.distilbert import sentence_embedding
from r3m_tpu.models.r3m import R3MConfig, r3m_embed
from r3m_tpu.parallel.mesh import batch_sharded, replicated

Pytree = Any


class TrainState(NamedTuple):
    params: Pytree  # trainable: {"convnet": ..., "lang_rew": ...?}
    batch_stats: Pytree  # BN running statistics (non-trainable)
    opt_state: Pytree
    step: jax.Array  # int32 scalar
    key: jax.Array  # PRNG state for negative sampling


def make_optimizer(cfg: R3MConfig) -> optax.GradientTransformation:
    """Adam with torch defaults (betas 0.9/0.999, eps 1e-8) — models_r3m.py:76.

    `cfg.lr` may also be a schedule string in the reference's `schedule()`
    grammar (utils.py:143-163, e.g. 'linear(1e-4,1e-5,2e6)'), evaluated
    per optimizer step — the reference carries that parser but never wires
    it to its Adam; here it's a first-class config option.
    """
    lr = cfg.lr
    if isinstance(lr, str):
        from r3m_tpu.utils.misc import schedule_fn

        lr = schedule_fn(lr)
    if cfg.optimizer == "adam":
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if cfg.optimizer == "lars":
        # large-batch scale-out (PAPERS.md: ResNet-50-in-15-min class
        # training uses layer-wise trust-ratio scaling at batch >= 4k).
        # Those recipes exempt BatchNorm params and biases from BOTH the
        # trust ratio and weight decay (You et al. §3, Goyal et al. §5.1);
        # every such leaf here is 1-D, every conv/linear kernel is >=2-D.
        def _weight_mask(params):
            return jax.tree_util.tree_map(lambda p: jnp.ndim(p) > 1, params)

        return optax.lars(
            lr,
            weight_decay=cfg.weight_decay,
            weight_decay_mask=_weight_mask,
            trust_ratio_mask=_weight_mask,
        )
    raise ValueError(f"optimizer must be 'adam'|'lars', got {cfg.optimizer!r}")


def create_train_state(
    cfg: R3MConfig, key: jax.Array, model_state: Optional[Dict[str, Pytree]] = None
) -> TrainState:
    from r3m_tpu.models.r3m import r3m_init

    k_init, k_state = jax.random.split(key)
    if model_state is None:
        model_state = r3m_init(k_init, cfg)
    params = model_state["params"]
    batch_stats = model_state["batch_stats"]
    # Packing concatenates ~106 per-layer BN vectors into per-role arrays —
    # transparent to Adam (elementwise), but LARS computes its trust ratio
    # per parameter array, so packing would merge 53 per-layer ratios into
    # one global one and change the update. Adam-only.
    if cfg.packed_bn and cfg.size != 0 and cfg.optimizer == "adam":
        # pack BEFORE tx.init so the Adam moments are packed too
        from r3m_tpu.models.resnet import is_packed, pack_bn_params, pack_bn_state

        if not is_packed(params["convnet"]):
            params = dict(params)
            params["convnet"] = pack_bn_params(params["convnet"], cfg.size)
            batch_stats = pack_bn_state(batch_stats, cfg.size)
    tx = make_optimizer(cfg)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        key=k_state,
    )


def _encode_and_loss(
    cfg: R3MConfig,
    params: Pytree,
    batch_stats: Pytree,
    bert_params: Optional[Pytree],
    batch: Dict[str, jax.Array],
    perms: Dict[str, jax.Array],
    train: bool,
    prenormalized: bool = False,
    bert_cfg=None,
    shard_mesh=None,
):
    """Shared forward: returns (full_loss, (metrics, new_batch_stats))."""
    images = batch["images"]  # [B, 5, H, W, 3]; [0,255] unless prenormalized
    bs = images.shape[0]
    flat = jnp.reshape(images, (bs * 5,) + images.shape[2:])
    emb, new_stats = r3m_embed(
        cfg, params, batch_stats, flat, train=train,
        prenormalized=prenormalized, shard_mesh=shard_mesh,
    )
    emb = jnp.reshape(emb, (bs, 5, -1))

    lang_emb = None
    lang_mask = None
    if cfg.langweight > 0:
        # Frozen BERT (reference wraps it in no_grad, models_language.py:29).
        from r3m_tpu.models.distilbert import BASE

        lang_emb = jax.lax.stop_gradient(
            sentence_embedding(
                bert_params,
                batch["token_ids"],
                batch["attn_mask"],
                bert_cfg or BASE,
            )
        )
        lang_mask = batch["lang_mask"].astype(jnp.float32)

    return r3m_loss(cfg, params, emb, lang_emb, lang_mask, perms) + (new_stats,)


def _attn_shard_mesh(cfg: R3MConfig, mesh):
    """The mesh the ViT fused-attention kernel must be shard_map-wrapped
    over, or None.

    `pl.pallas_call` carries no GSPMD partitioning rule: under a plain
    jit-with-shardings the kernel custom-call would force per-layer
    gathers to the full global batch. The standard JAX answer for a
    per-sample kernel is `jax.shard_map` over the data axes — attention
    never crosses samples, so per-shard execution is exact and adds zero
    collectives (vit_b32_apply wraps the call; numerics + collective
    parity vs the einsum path are pinned on the 8-device virtual mesh by
    tests/test_train_step.py). Only relevant when the resolved lowering is
    actually the kernel; the einsum path partitions cleanly unwrapped.
    """
    if mesh is not None and cfg.size == 0:
        return mesh
    return None


def place_bert_params(bert_params: Pytree, mesh) -> Pytree:
    """Replicate the frozen BERT tree over the mesh — idempotently.

    A tree whose leaves already carry the target replicated sharding is
    returned AS-IS, so `make_train_step` and `make_eval_step` built from
    the same pre-placed tree share one set of device buffers instead of
    each `device_put`-ing its own ~265 MB replica (the workspace places
    once and hands the same tree to both builders).
    """
    target = replicated(mesh)
    leaves = jax.tree_util.tree_leaves(bert_params)
    if leaves and all(
        isinstance(x, jax.Array) and x.sharding == target for x in leaves
    ):
        return bert_params
    return jax.device_put(bert_params, target)


def _check_bert(
    cfg: R3MConfig, bert_params: Optional[Pytree], mesh=None
) -> Optional[Pytree]:
    """Validate presence and place the frozen weights on device(s) once.

    Snapshot loaders hand back numpy pytrees; numpy[tracer] indexing (the
    embedding lookup) fails at trace time. Under a mesh the tree must be
    device_put with the REPLICATED sharding the jitted step declares —
    jax.jit reshards mismatched arguments on every call, which would
    re-broadcast ~265 MB of BERT weights each training step.
    """
    if cfg.langweight > 0 and bert_params is None:
        raise ValueError("langweight > 0 requires bert_params (frozen DistilBERT)")
    if bert_params is None:
        return None
    if mesh is not None:
        return place_bert_params(bert_params, mesh)
    return jax.tree_util.tree_map(jnp.asarray, bert_params)


def make_train_step(
    cfg: R3MConfig,
    bert_params: Optional[Pytree] = None,
    mesh=None,
    donate: bool = True,
    doaug: str = "none",
    grad_accum: int = 1,
    bert_cfg=None,
):
    """Build the jitted train step: (state, batch) -> (state, metrics).

    `batch` is a dict with:
      images:     [B, 5, H, W, 3] float32/uint8 in [0, 255] (NHWC frames)
      token_ids:  [B, T] int32        (only when cfg.langweight > 0)
      attn_mask:  [B, T] int32
      lang_mask:  [B]    float32      (1.0 where caption non-empty)

    `doaug` in {"none", "rc", "rctraj"} applies the reference's
    RandomResizedCrop on-device before encoding (data_loaders.py:47-52) —
    trajectory-consistent for "rctraj".

    `grad_accum=N` splits the batch into N sequential microbatches (one
    `lax.scan`), averages their gradients, and applies ONE Adam update —
    reference-scale effective batches on hardware that can't fit them.
    Semantics note: InfoNCE negatives and BN batch statistics are drawn per
    MICROBATCH (B/N samples), exactly as if the reference ran at the smaller
    batch size; only the gradient average spans the full batch.

    When `mesh` is given the returned function carries in/out shardings
    (params replicated, batch sharded on dp) — call it on globally-shaped
    arrays; use `r3m_tpu.parallel.mesh.shard_batch` to place host batches.
    """
    if doaug not in ("none", "rc", "rctraj"):
        raise ValueError(
            f"doaug must be one of 'none'|'rc'|'rctraj', got {doaug!r}"
            " — an unknown value would silently train without augmentation"
        )
    attn_mesh = _attn_shard_mesh(cfg, mesh)
    bert_params = _check_bert(cfg, bert_params, mesh)
    tx = make_optimizer(cfg)

    # Frozen BERT weights are passed as an explicit (replicated) jit
    # argument rather than a closure capture: closure constants are baked
    # into each compiled executable, so the train and eval programs would
    # each hold their own ~265 MB copy in HBM and bloat the compile cache.
    def step_fn(
        state: TrainState, batch: Dict[str, jax.Array], bert: Optional[Pytree]
    ):
        key, aug_key, new_key = jax.random.split(state.key, 3)
        prenorm = doaug in ("rc", "rctraj")
        if prenorm:
            # Fused augment: crop weights carry the /255 rescale and the
            # output is channel-normalized encoder input in the compute
            # dtype — bfloat16 halves the HBM bytes of the one stage that
            # streams full-resolution frames (uint8 pixel values are exact
            # in bfloat16; the MXU accumulates f32).
            mean, std = cfg.norm_stats
            batch = dict(batch)
            batch["images"] = random_resized_crop_clips(
                aug_key,
                batch["images"],
                out_size=cfg.image_size,
                mode=doaug,
                compute_dtype=cfg.jnp_compute_dtype,
                mean=mean,
                std=std,
            )
        bs = batch["images"].shape[0]

        if grad_accum > 1:
            if bs % grad_accum:
                raise ValueError(
                    f"batch size {bs} not divisible by grad_accum={grad_accum}"
                )
            micro_bs = bs // grad_accum
            micro = {
                k: jnp.reshape(v, (grad_accum, micro_bs) + v.shape[1:])
                for k, v in batch.items()
            }
            keys = jax.random.split(key, grad_accum)

            def one_micro(carry, xs):
                stats, gsum = carry
                k, mb = xs
                perms = draw_permutations(k, micro_bs, cfg.num_negatives)

                def loss_fn(params):
                    loss, metrics, new_stats = _encode_and_loss(
                        cfg, params, stats, bert, mb, perms, True, prenorm,
                        bert_cfg, shard_mesh=attn_mesh,
                    )
                    return loss, (metrics, new_stats)

                (_, (metrics, new_stats)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
                return (new_stats, gsum), metrics

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (new_stats, gsum), metrics_seq = jax.lax.scan(
                one_micro, (state.batch_stats, zeros), (keys, micro)
            )
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, gsum)
            metrics = {
                k: jnp.mean(v, axis=0) for k, v in metrics_seq.items()
            }
        else:
            perms = draw_permutations(key, bs, cfg.num_negatives)

            def loss_fn(params):
                loss, metrics, new_stats = _encode_and_loss(
                    cfg, params, state.batch_stats, bert, batch, perms, True,
                    prenorm, bert_cfg, shard_mesh=attn_mesh,
                )
                return loss, (metrics, new_stats)

            (_, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            metrics = dict(metrics)
        # global gradient norm: cheap (one reduce) and the single most
        # useful training-health signal the reference lacks
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
            key=new_key,
        )
        return new_state, metrics

    if mesh is None:
        jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    else:
        rep = replicated(mesh)
        dp = batch_sharded(mesh)
        state_sh = jax.tree_util.tree_map(lambda _: rep, _state_structure())
        jitted = jax.jit(
            step_fn,
            in_shardings=(state_sh, dp, rep),
            out_shardings=(state_sh, rep),
            donate_argnums=(0,) if donate else (),
        )

    def step(state, batch):
        return jitted(state, batch, bert_params)

    # AOT surface for tests/tools: same (state, batch) signature
    step.lower = lambda state, batch: jitted.lower(state, batch, bert_params)
    return step


def _state_structure():
    """Placeholder pytree prefix: TrainState treated as one replicated unit."""
    # jax accepts a sharding pytree *prefix*; a single leaf per TrainState
    # field would need the real structure. Simplest correct prefix: replicate
    # everything — return a TrainState of Nones replaced by tree_map above.
    return TrainState(params=0, batch_stats=0, opt_state=0, step=0, key=0)


def make_eval_step(
    cfg: R3MConfig, bert_params: Optional[Pytree] = None, mesh=None,
    bert_cfg=None,
):
    """Eval step: same losses/metrics, BN in eval mode, no optimizer update.

    Matches the reference's `update(eval=True)` under torch.no_grad
    (train_representation.py:114-117): model.eval() + skip the step.
    """
    attn_mesh = _attn_shard_mesh(cfg, mesh)
    bert_params = _check_bert(cfg, bert_params, mesh)

    def eval_fn(
        state: TrainState,
        batch: Dict[str, jax.Array],
        key: jax.Array,
        bert: Optional[Pytree],
    ):
        bs = batch["images"].shape[0]
        perms = draw_permutations(key, bs, cfg.num_negatives)
        loss, metrics, _ = _encode_and_loss(
            cfg, state.params, state.batch_stats, bert, batch, perms, False,
            bert_cfg=bert_cfg, shard_mesh=attn_mesh,
        )
        return metrics

    if mesh is None:
        jitted = jax.jit(eval_fn)
    else:
        rep = replicated(mesh)
        dp = batch_sharded(mesh)
        state_sh = jax.tree_util.tree_map(lambda _: rep, _state_structure())
        jitted = jax.jit(
            eval_fn, in_shardings=(state_sh, dp, rep, rep), out_shardings=rep
        )

    def eval_step(state, batch, key):
        return jitted(state, batch, key, bert_params)

    eval_step.lower = lambda state, batch, key: jitted.lower(
        state, batch, key, bert_params
    )
    return eval_step
