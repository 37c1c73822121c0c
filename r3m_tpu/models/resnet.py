"""TPU-native functional ResNet-18/34/50 visual encoders.

Reproduces the capability of the reference's torchvision backbones
(``/root/reference/r3m/models/models_r3m.py:44-52``: resnet18/34 -> 512-d,
resnet50 -> 2048-d, ``fc`` replaced by Identity so the output is the
global-average-pooled feature) as a pure-functional JAX model:

* params / batch-norm state are plain nested-dict pytrees (shardable,
  checkpointable, `jax.grad`-able with no framework magic),
* NHWC layout end to end — the TPU-preferred convolution layout, so XLA
  tiles every conv onto the MXU without layout transposes,
* optional bfloat16 compute (params stay f32; matmul/conv accumulate f32),
* BatchNorm semantics match torch: eps=1e-5, momentum=0.1, biased variance
  for normalization, unbiased variance for the running-stat update.

Param-tree naming intentionally mirrors torchvision state_dict naming
(`conv1`, `bn1`, `layer{1..4}.{i}.conv{j}`, `downsample`) so the
PyTorch-checkpoint converter (`r3m_tpu/convert.py`) is a mechanical rename.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

Pytree = Any

# ---------------------------------------------------------------------------
# Architecture specs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ResNetSpec:
    """Static architecture description (hashable -> safe to close over in jit)."""

    name: str
    block: str  # "basic" | "bottleneck"
    stage_sizes: Tuple[int, int, int, int]
    width: int = 64
    expansion: int = 1

    @property
    def out_dim(self) -> int:
        return self.width * 8 * self.expansion


RESNET_SPECS: Dict[int, ResNetSpec] = {
    18: ResNetSpec("resnet18", "basic", (2, 2, 2, 2), expansion=1),
    34: ResNetSpec("resnet34", "basic", (3, 4, 6, 3), expansion=1),
    50: ResNetSpec("resnet50", "bottleneck", (3, 4, 6, 3), expansion=4),
}


# ---------------------------------------------------------------------------
# Primitive layers (functional)
# ---------------------------------------------------------------------------


def conv_init(key, kh, kw, cin, cout, dtype=jnp.float32):
    """He/Kaiming-normal fan-out init, matching torchvision's conv init."""
    fan_out = kh * kw * cout
    std = np.sqrt(2.0 / fan_out)
    return {"w": jax.random.normal(key, (kh, kw, cin, cout), dtype) * std}


def bn_init(c, dtype=jnp.float32):
    params = {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
    state = {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}
    return params, state


def conv2d(x, w, stride=1, padding=1, precision=None):
    """NHWC conv with HWIO weights; accumulates in f32 on the MXU.

    `precision=None` uses the backend default (bf16 inputs on TPU — fast
    path for training); pass `jax.lax.Precision.HIGHEST` for f32-faithful
    parity (e.g. checkpoint-parity inference).
    """
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    # No preferred_element_type: the MXU accumulates bf16 inputs in f32
    # natively and emits the input dtype; requesting an f32 output breaks
    # the transpose (grad) rule's dtype matching for bf16 inputs.
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),  # params live in f32; compute in the input dtype
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )


def batch_norm(x, params, state, *, train: bool, momentum=0.1, eps=1e-5):
    """Torch-semantics BatchNorm over NHWC (normalize over N,H,W).

    Returns (y, new_state). In train mode, normalization uses the biased
    batch variance while the running-var update uses the unbiased estimate
    (torch.nn.BatchNorm2d behavior).
    """
    scale = params["scale"].astype(jnp.float32)
    bias = params["bias"].astype(jnp.float32)
    if train:
        xf = x.astype(jnp.float32)
        # "bn_stat" tags make the tiny [C] reductions saveable under the
        # selective-remat policy (resnet_apply remat="conv_saved") so the
        # backward never re-reduces a full activation; no-ops otherwise.
        mean = checkpoint_name(jnp.mean(xf, axis=(0, 1, 2)), "bn_stat")
        var = checkpoint_name(
            jnp.mean(jnp.square(xf), axis=(0, 1, 2)), "bn_stat"
        ) - jnp.square(mean)
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean = state["mean"].astype(jnp.float32)
        var = state["var"].astype(jnp.float32)
        new_state = state
    inv = jax.lax.rsqrt(var + eps) * scale
    y = x.astype(jnp.float32) * inv + (bias - mean * inv)
    return y.astype(x.dtype), new_state


def max_pool_3x3s2(x):
    """torch MaxPool2d(kernel=3, stride=2, padding=1) over NHWC."""
    neg_inf = (
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    )
    return jax.lax.reduce_window(
        x,
        neg_inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _pool_views(xp, oh, ow):
    """The 9 stride-2 shifted views of the padded input, window scan order."""
    return [
        xp[:, dh : dh + 2 * oh - 1 : 2, dw : dw + 2 * ow - 1 : 2, :]
        for dh in range(3)
        for dw in range(3)
    ]


def max_pool_3x3s2_amax(x):
    """`max_pool_3x3s2` with an argmax-saving backward.

    Same forward result; the VJP saves the int8 window-offset argmax
    (first-max tiebreak, row-major window order — torch MaxPool2d and XLA
    select-and-scatter semantics) instead of letting autodiff re-derive the
    max locations from `x`. The backward then becomes 9 masked strided adds
    that read only the [OH,OW] gradient + int8 index maps — cheaper in HBM
    bytes than select-and-scatter's two re-reads of the [H,W] input
    (BASELINE.md round-2 audit: select-and-scatter at 1.86x its roofline
    bound, 1.9% of the resnet50 step).
    """
    return _amax_pool(x, x.shape, jnp.dtype(x.dtype).name)


def _amax_pool_primal(x, in_shape, dtype_name):
    return max_pool_3x3s2(x)


_amax_pool = jax.custom_vjp(_amax_pool_primal, nondiff_argnums=(1, 2))


def _amax_pool_fwd(x, in_shape, dtype_name):
    n, h, w, c = in_shape
    oh, ow = (h - 1) // 2 + 1, (w - 1) // 2 + 1
    neg_inf = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg_inf)
    views = _pool_views(xp, oh, ow)
    y = views[0]
    for v in views[1:]:
        y = jnp.maximum(y, v)
    idx = jnp.full(y.shape, 8, jnp.int8)
    for k in range(7, -1, -1):  # downward so ties resolve to the FIRST max
        idx = jnp.where(views[k] == y, jnp.int8(k), idx)
    return y, idx


def _amax_pool_bwd(in_shape, dtype_name, idx, g):
    n, h, w, c = in_shape
    oh, ow = (h - 1) // 2 + 1, (w - 1) // 2 + 1
    g = g.astype(jnp.float32)
    dxp = jnp.zeros((n, h + 2, w + 2, c), jnp.float32)
    for k in range(9):
        dh, dw = divmod(k, 3)
        contrib = jnp.where(idx == k, g, 0.0)
        dxp = dxp.at[
            :, dh : dh + 2 * oh - 1 : 2, dw : dw + 2 * ow - 1 : 2, :
        ].add(contrib)
    return (dxp[:, 1 : h + 1, 1 : w + 1, :].astype(dtype_name),)


_amax_pool.defvjp(_amax_pool_fwd, _amax_pool_bwd)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _basic_block_init(key, cin, planes, stride, dtype):
    keys = jax.random.split(key, 3)
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    p["conv1"] = conv_init(keys[0], 3, 3, cin, planes, dtype)
    p["bn1"], s["bn1"] = bn_init(planes, dtype)
    p["conv2"] = conv_init(keys[1], 3, 3, planes, planes, dtype)
    p["bn2"], s["bn2"] = bn_init(planes, dtype)
    if stride != 1 or cin != planes:
        p["downsample"] = {"conv": conv_init(keys[2], 1, 1, cin, planes, dtype)}
        bn_p, bn_s = bn_init(planes, dtype)
        p["downsample"]["bn"] = bn_p
        s["downsample"] = {"bn": bn_s}
    return p, s


def _basic_block_apply(x, p, s, stride, *, train, precision=None):
    ns: Dict[str, Any] = {}
    y = _named_conv(x, p["conv1"]["w"], stride=stride, padding=1, precision=precision)
    y, ns["bn1"] = batch_norm(y, p["bn1"], s["bn1"], train=train)
    y = jax.nn.relu(y)
    y = _named_conv(y, p["conv2"]["w"], stride=1, padding=1, precision=precision)
    y, ns["bn2"] = batch_norm(y, p["bn2"], s["bn2"], train=train)
    if "downsample" in p:
        sc = _named_conv(x, p["downsample"]["conv"]["w"], stride=stride, padding=0, precision=precision)
        sc, ds_bn = batch_norm(sc, p["downsample"]["bn"], s["downsample"]["bn"], train=train)
        ns["downsample"] = {"bn": ds_bn}
    else:
        sc = x
    return jax.nn.relu(y + sc), ns


def _bottleneck_init(key, cin, planes, stride, expansion, dtype):
    keys = jax.random.split(key, 4)
    cout = planes * expansion
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    p["conv1"] = conv_init(keys[0], 1, 1, cin, planes, dtype)
    p["bn1"], s["bn1"] = bn_init(planes, dtype)
    p["conv2"] = conv_init(keys[1], 3, 3, planes, planes, dtype)
    p["bn2"], s["bn2"] = bn_init(planes, dtype)
    p["conv3"] = conv_init(keys[2], 1, 1, planes, cout, dtype)
    p["bn3"], s["bn3"] = bn_init(cout, dtype)
    if stride != 1 or cin != cout:
        p["downsample"] = {"conv": conv_init(keys[3], 1, 1, cin, cout, dtype)}
        bn_p, bn_s = bn_init(cout, dtype)
        p["downsample"]["bn"] = bn_p
        s["downsample"] = {"bn": bn_s}
    return p, s


def _named_conv(x, w, stride, padding, precision=None):
    """conv2d whose output is tagged "conv_out" for the selective-remat
    policy (a no-op outside jax.checkpoint)."""
    return checkpoint_name(
        conv2d(x, w, stride=stride, padding=padding, precision=precision),
        "conv_out",
    )


def _bottleneck_apply(x, p, s, stride, *, train, precision=None):
    # torchvision ordering: 1x1 (stride 1) -> 3x3 (stride s) -> 1x1.
    ns: Dict[str, Any] = {}
    y = _named_conv(x, p["conv1"]["w"], stride=1, padding=0, precision=precision)
    y, ns["bn1"] = batch_norm(y, p["bn1"], s["bn1"], train=train)
    y = jax.nn.relu(y)
    y = _named_conv(y, p["conv2"]["w"], stride=stride, padding=1, precision=precision)
    y, ns["bn2"] = batch_norm(y, p["bn2"], s["bn2"], train=train)
    y = jax.nn.relu(y)
    y = _named_conv(y, p["conv3"]["w"], stride=1, padding=0, precision=precision)
    y, ns["bn3"] = batch_norm(y, p["bn3"], s["bn3"], train=train)
    if "downsample" in p:
        sc = _named_conv(x, p["downsample"]["conv"]["w"], stride=stride, padding=0, precision=precision)
        sc, ds_bn = batch_norm(sc, p["downsample"]["bn"], s["downsample"]["bn"], train=train)
        ns["downsample"] = {"bn": ds_bn}
    else:
        sc = x
    return jax.nn.relu(y + sc), ns


# ---------------------------------------------------------------------------
# Full network
# ---------------------------------------------------------------------------


def resnet_init(key, size: int, dtype=jnp.float32) -> Tuple[Pytree, Pytree]:
    """Initialize a ResNet; returns (params, batch_stats) pytrees."""
    spec = RESNET_SPECS[size]
    key, k0 = jax.random.split(key)
    params: Dict[str, Any] = {"conv1": conv_init(k0, 7, 7, 3, spec.width, dtype)}
    state: Dict[str, Any] = {}
    params["bn1"], state["bn1"] = bn_init(spec.width, dtype)

    cin = spec.width
    for stage, num_blocks in enumerate(spec.stage_sizes):
        planes = spec.width * (2**stage)
        blocks_p, blocks_s = [], []
        for b in range(num_blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            key, bk = jax.random.split(key)
            if spec.block == "basic":
                bp, bs = _basic_block_init(bk, cin, planes, stride, dtype)
                cin = planes
            else:
                bp, bs = _bottleneck_init(bk, cin, planes, stride, spec.expansion, dtype)
                cin = planes * spec.expansion
            blocks_p.append(bp)
            blocks_s.append(bs)
        params[f"layer{stage + 1}"] = blocks_p
        state[f"layer{stage + 1}"] = blocks_s
    return params, state


def resnet_apply(
    params: Pytree,
    state: Pytree,
    x: jax.Array,
    *,
    size: int,
    train: bool = False,
    compute_dtype=None,
    precision=None,
    remat: str = "none",
) -> Tuple[jax.Array, Pytree]:
    """Forward pass. `x` is NHWC, already normalized. Returns (features, new_state).

    Features are the global-average-pooled embedding ([B, out_dim]) — the
    reference's `fc = Identity()` semantics (models_r3m.py:62).

    remat="conv_saved" wraps every residual block in `jax.checkpoint` with
    a save-only-these-names policy: conv outputs and the [C]-sized BN batch
    statistics are saved; the elementwise BN-normalize/ReLU passes are
    recomputed during the backward (cheap — their inputs are the saved conv
    outputs the backward reads anyway). This trades a little VPU recompute
    for not storing the post-activation copies of every layer — an
    HBM-residual-traffic experiment, NOT the round-1 full-block remat
    (which recomputed the convs themselves and lost 18%).
    """
    spec = RESNET_SPECS[size]
    # Packed-BN training layout: rebuild per-layer views as static slices of
    # the packed vectors (fused into each BN's normalize by XLA; same math,
    # results agree with the canonical layout to f32 rounding — bn_layout).
    packed_in = is_packed(params)
    if packed_in:
        params = unpack_bn_params(params, size)
        state = unpack_bn_state(state, size)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)

    y = conv2d(x, params["conv1"]["w"], stride=2, padding=3, precision=precision)
    new_state: Dict[str, Any] = {}
    y, new_state["bn1"] = batch_norm(y, params["bn1"], state["bn1"], train=train)
    y = jax.nn.relu(y)
    y = max_pool_3x3s2(y)

    apply_block = _basic_block_apply if spec.block == "basic" else _bottleneck_apply
    if remat == "conv_saved":
        policy = jax.checkpoint_policies.save_only_these_names(
            "conv_out", "bn_stat"
        )

        def run_block(yb, pb, sb, stride):
            fn = lambda y_, p_, s_: apply_block(  # noqa: E731
                y_, p_, s_, stride, train=train, precision=precision
            )
            return jax.checkpoint(fn, policy=policy)(yb, pb, sb)

    elif remat == "none":

        def run_block(yb, pb, sb, stride):
            return apply_block(
                yb, pb, sb, stride, train=train, precision=precision
            )

    else:
        raise ValueError(f"unknown remat mode {remat!r}")
    for stage, num_blocks in enumerate(spec.stage_sizes):
        name = f"layer{stage + 1}"
        stage_states = []
        for b in range(num_blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            y, bs = run_block(y, params[name][b], state[name][b], stride)
            stage_states.append(bs)
        new_state[name] = stage_states

    # Adaptive average pool to 1x1 + flatten == mean over spatial dims.
    feats = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
    if packed_in:
        new_state = pack_bn_state(new_state, size)
    return feats, new_state


def resnet_out_dim(size: int) -> int:
    return RESNET_SPECS[size].out_dim


# ---------------------------------------------------------------------------
# Packed BatchNorm layout (training-time parameter layout)
# ---------------------------------------------------------------------------
#
# A resnet50 carries 53 BatchNorm layers = 106 trainable [C] vectors + 106
# running-stat vectors + (under Adam) 212 moment vectors — ~400 sub-KB
# buffers crossing the jitted train step every iteration. XLA's
# memory-space assignment streams each one to VMEM individually (~3.5k
# async ~1 KB copies/step, 1.6-3.5% of step time on v5e — BASELINE.md
# round-2 audit). Packing every BN vector into ONE contiguous [total_C]
# array per role (scale/bias/mean/var) turns those into a handful of
# ~100 KB buffers; inside the program each layer reads a static slice,
# which XLA fuses into the BN normalize same as before. The math is
# identical; compiled fusion boundaries differ, so results agree to f32
# rounding (~1e-7 rel — same class as any XLA program restructuring).
#
# The packed layout exists only inside the training state; checkpoints,
# converters, and the serving path all keep the canonical torchvision-
# named tree (`r3m_tpu/checkpoint.py` packs/unpacks at the boundary).

PACKED_KEY = "bn_packed"


def bn_layout(size: int):
    """Ordered (path, channels, offset) table for the packed-BN layout.

    `path` indexes BOTH the params tree (leaf {"scale","bias"}) and the
    batch-stats tree (leaf {"mean","var"}) — e.g. ("layer1", 0, "bn1") or
    ("layer2", 0, "downsample", "bn"). Returns (entries, total_channels).
    """
    spec = RESNET_SPECS[size]
    entries = [(("bn1",), spec.width)]
    cin = spec.width
    for stage, num_blocks in enumerate(spec.stage_sizes):
        planes = spec.width * (2**stage)
        cout = planes * spec.expansion
        for b in range(num_blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            base = (f"layer{stage + 1}", b)
            entries.append((base + ("bn1",), planes))
            entries.append((base + ("bn2",), planes))
            if spec.block == "bottleneck":
                entries.append((base + ("bn3",), cout))
            if stride != 1 or cin != cout:
                entries.append((base + ("downsample", "bn"), cout))
            cin = cout
    offset = 0
    out = []
    for path, c in entries:
        out.append((path, c, offset))
        offset += c
    return out, offset


def infer_resnet_size(conv_params) -> int:
    """Recover the resnet size from a (packed or canonical) params tree."""
    block0 = conv_params["layer1"][0]
    if "conv3" in block0:
        return 50
    return 34 if len(conv_params["layer1"]) == 3 else 18


def _tree_get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _tree_set(tree, path, value):
    node = tree
    for p in path[:-1]:
        if isinstance(p, int):
            node = node[p]
        else:
            node = node.setdefault(p, {})
    node[path[-1]] = value


def _strip_bn(node):
    """Copy of a params tree with every BN leaf-dict removed."""
    if isinstance(node, list):
        return [_strip_bn(v) for v in node]
    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            if k.startswith("bn"):
                continue
            if k == "downsample":
                ds = {dk: _strip_bn(dv) for dk, dv in v.items() if dk != "bn"}
                if ds:
                    out[k] = ds
                continue
            out[k] = _strip_bn(v)
        return out
    return node


def _backend_of(leaf):
    # numpy in -> numpy out: snapshot writers run off-thread and must not
    # bounce host trees through device HBM just to reshuffle a layout
    return np if isinstance(leaf, np.ndarray) else jnp


def pack_bn_params(conv_params, size: int):
    """Canonical conv-params tree -> packed (BN vectors concatenated)."""
    entries, _ = bn_layout(size)
    xp = _backend_of(_tree_get(conv_params, entries[0][0])["scale"])
    packed = _strip_bn(conv_params)
    packed[PACKED_KEY] = {
        "scale": xp.concatenate(
            [_tree_get(conv_params, p)["scale"] for p, _, _ in entries]
        ),
        "bias": xp.concatenate(
            [_tree_get(conv_params, p)["bias"] for p, _, _ in entries]
        ),
    }
    return packed


def unpack_bn_params(packed, size: int):
    """Packed conv-params tree -> canonical (per-layer BN dicts)."""
    entries, _ = bn_layout(size)
    scale, bias = packed[PACKED_KEY]["scale"], packed[PACKED_KEY]["bias"]
    out = _strip_bn({k: v for k, v in packed.items() if k != PACKED_KEY})
    for path, c, o in entries:
        _tree_set(out, path, {"scale": scale[o : o + c], "bias": bias[o : o + c]})
    return out


def pack_bn_state(stats, size: int):
    """Canonical batch-stats tree -> {"bn_packed": {"mean", "var"}}."""
    entries, _ = bn_layout(size)
    xp = _backend_of(_tree_get(stats, entries[0][0])["mean"])
    return {
        PACKED_KEY: {
            "mean": xp.concatenate(
                [_tree_get(stats, p)["mean"] for p, _, _ in entries]
            ),
            "var": xp.concatenate(
                [_tree_get(stats, p)["var"] for p, _, _ in entries]
            ),
        }
    }


def unpack_bn_state(packed_stats, size: int):
    """Packed batch-stats -> canonical nested tree."""
    entries, _ = bn_layout(size)
    mean, var = packed_stats[PACKED_KEY]["mean"], packed_stats[PACKED_KEY]["var"]
    out: Dict[str, Any] = {}
    spec = RESNET_SPECS[size]
    for stage, num_blocks in enumerate(spec.stage_sizes):
        out[f"layer{stage + 1}"] = [{} for _ in range(num_blocks)]
    for path, c, o in entries:
        _tree_set(out, path, {"mean": mean[o : o + c], "var": var[o : o + c]})
    return out


def is_packed(conv_params) -> bool:
    return isinstance(conv_params, dict) and PACKED_KEY in conv_params


# ---------------------------------------------------------------------------
# BatchNorm folding (inference/serving path)
# ---------------------------------------------------------------------------


def fold_batchnorm(params: Pytree, state: Pytree, size: int, eps=1e-5) -> Pytree:
    """Fold eval-mode BN into the preceding conv: w' = w*inv, b' = bias - mean*inv.

    Exact same math as conv -> batch_norm(train=False) (associativity aside),
    but removes every BN normalize pass from the inference forward — the
    serving-path equivalent of torch deploy-time BN fusion. Returns a
    folded-params pytree for `resnet_apply_folded`.
    """
    spec = RESNET_SPECS[size]

    def fold(conv_p, bn_p, bn_s):
        inv = bn_p["scale"] * jax.lax.rsqrt(bn_s["var"] + eps)
        return {
            "w": conv_p["w"] * inv,  # broadcasts over O (last axis of HWIO)
            "b": bn_p["bias"] - bn_s["mean"] * inv,
        }

    folded: Dict[str, Any] = {
        "conv1": fold(params["conv1"], params["bn1"], state["bn1"])
    }
    for stage, num_blocks in enumerate(spec.stage_sizes):
        name = f"layer{stage + 1}"
        have = len(params.get(name, ()))
        if have != num_blocks:
            raise ValueError(
                f"resnet{size} expects {num_blocks} blocks in {name}, "
                f"params have {have} — the weights were saved from a "
                "different backbone than cfg.size claims"
            )
        blocks = []
        for b in range(num_blocks):
            p, s = params[name][b], state[name][b]
            fp = {
                "conv1": fold(p["conv1"], p["bn1"], s["bn1"]),
                "conv2": fold(p["conv2"], p["bn2"], s["bn2"]),
            }
            if "conv3" in p:
                fp["conv3"] = fold(p["conv3"], p["bn3"], s["bn3"])
            if "downsample" in p:
                fp["downsample"] = fold(
                    p["downsample"]["conv"], p["downsample"]["bn"], s["downsample"]["bn"]
                )
            blocks.append(fp)
        folded[name] = blocks
    return folded


def _conv_bias(x, p, stride, padding, precision=None):
    return conv2d(x, p["w"], stride, padding, precision) + p["b"].astype(x.dtype)


def resnet_apply_folded(
    folded: Pytree, x: jax.Array, *, size: int, compute_dtype=None, precision=None
) -> jax.Array:
    """Inference forward over BN-folded params (no BN state, no stats passes)."""
    spec = RESNET_SPECS[size]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    y = jax.nn.relu(_conv_bias(x, folded["conv1"], 2, 3, precision))
    y = max_pool_3x3s2(y)
    basic = spec.block == "basic"
    for stage, num_blocks in enumerate(spec.stage_sizes):
        for b in range(num_blocks):
            p = folded[f"layer{stage + 1}"][b]
            stride = 2 if (stage > 0 and b == 0) else 1
            sc = (
                _conv_bias(y, p["downsample"], stride, 0, precision)
                if "downsample" in p
                else y
            )
            if basic:
                h = jax.nn.relu(_conv_bias(y, p["conv1"], stride, 1, precision))
                h = _conv_bias(h, p["conv2"], 1, 1, precision)
            else:
                h = jax.nn.relu(_conv_bias(y, p["conv1"], 1, 0, precision))
                h = jax.nn.relu(_conv_bias(h, p["conv2"], stride, 1, precision))
                h = _conv_bias(h, p["conv3"], 1, 0, precision)
            y = jax.nn.relu(h + sc)
    return jnp.mean(y.astype(jnp.float32), axis=(1, 2))
