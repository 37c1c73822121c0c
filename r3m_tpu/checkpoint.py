"""Checkpointing: TPU-native snapshot format + reference-checkpoint import.

Native format replaces the reference's pickled torch snapshots
(``/root/reference/r3m/train_representation.py:123-138``: ``snapshot.pt``
with ``{"r3m": state_dict, "global_step": int}``). Snapshots here are a
single ``.npz`` (zip of raw arrays — mmap-able, no pickle, portable across
torch/JAX versions) holding the flattened train-state pytree plus a JSON
metadata entry (global_step, model config), with the same rolling
``snapshot.npz`` + per-eval ``snapshot_{step}.npz`` layout and auto-resume
semantics.

`load_torch_checkpoint` imports the reference's published ``model.pt``
files (and training snapshots) through `r3m_tpu.convert`, so
`load_r3m("resnet50")` reproduces reference embeddings from the original
artifacts.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax

Pytree = Any

_META_KEY = "__meta__"


# ---------------------------------------------------------------------------
# Pytree <-> flat dict with encoded paths ("d:a/l:0/d:w")
# ---------------------------------------------------------------------------


def _flatten(tree: Pytree, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        if not tree:  # empty containers must round-trip (ViT batch_stats={})
            out[prefix + "e:"] = np.zeros((0,))
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}d:{k}/"))
    elif isinstance(tree, (list, tuple)):
        if not tree:
            out[prefix + "E:"] = np.zeros((0,))
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}l:{i}/"))
    elif tree is None:
        out[prefix + "n:"] = np.zeros((0,))
    else:
        out[prefix + "a:"] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Pytree:
    root: Dict[str, Any] = {}
    for key, arr in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        leaf = parts[-1]
        node[leaf] = None if leaf.startswith("n:") else arr

    def build(node):
        if not isinstance(node, dict):
            return node
        if len(node) == 1:
            (k, v), = node.items()
            if k == "a:" or k == "n:":
                return v
            if k == "e:":  # empty-dict marker
                return {}
            if k == "E:":  # empty-list marker
                return []
        if all(k.startswith("l:") for k in node):
            items = sorted(node.items(), key=lambda kv: int(kv[0][2:]))
            return [build(v) for _, v in items]
        return {k[2:]: build(v) for k, v in node.items()}

    return build(root)


# ---------------------------------------------------------------------------
# Native snapshots
# ---------------------------------------------------------------------------


def save_snapshot(path: str, tree: Pytree, meta: Optional[Dict] = None) -> None:
    """Write pytree + metadata to `path` (.npz). Atomic via tmp+rename."""
    flat = _flatten(jax.tree_util.tree_map(np.asarray, tree))
    meta_arr = np.frombuffer(
        json.dumps(meta or {}).encode("utf-8"), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat, **{_META_KEY: meta_arr})
    os.replace(tmp, path)


def load_snapshot(path: str) -> Tuple[Pytree, Dict]:
    """Read a snapshot; returns (pytree, meta)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files if k != _META_KEY}
        meta = (
            json.loads(bytes(z[_META_KEY]).decode("utf-8"))
            if _META_KEY in z.files
            else {}
        )
    return _unflatten(flat), meta


# ---------------------------------------------------------------------------
# Packed-BN layout boundary
# ---------------------------------------------------------------------------
#
# The trainer holds ResNet BN vectors packed into contiguous per-role arrays
# (r3m_tpu/models/resnet.py bn_layout — a measured copy-storm fix), but
# snapshots are ALWAYS written in the canonical torchvision-named layout so
# the npz format, converters, serving, and parity tooling never see the
# runtime layout. These helpers translate at the save/load boundary.


def _map_params_like(node, fn):
    """Apply `fn` to every params-shaped subtree (a dict with a "convnet"
    key) inside a pytree — reaches the Adam moments inside opt_state, both
    live (namedtuples) and as loaded from npz (plain lists)."""
    if isinstance(node, dict):
        if "convnet" in node:
            return fn(node)
        return {k: _map_params_like(v, fn) for k, v in node.items()}
    if isinstance(node, tuple) and hasattr(node, "_fields"):  # namedtuple
        return type(node)(*(_map_params_like(v, fn) for v in node))
    if isinstance(node, (list, tuple)):
        return type(node)(_map_params_like(v, fn) for v in node)
    return node


def canonicalize_train_tree(tree: Dict) -> Dict:
    """Packed-BN runtime layout -> canonical layout (no-op when canonical)."""
    from r3m_tpu.models.resnet import (
        infer_resnet_size,
        is_packed,
        unpack_bn_params,
        unpack_bn_state,
    )

    conv = tree.get("params", {}).get("convnet")
    if not is_packed(conv):
        return tree
    size = infer_resnet_size(conv)

    def fix(params_like):
        if is_packed(params_like.get("convnet")):
            params_like = dict(params_like)
            params_like["convnet"] = unpack_bn_params(
                params_like["convnet"], size
            )
        return params_like

    tree = dict(tree)
    tree["params"] = fix(tree["params"])
    tree["batch_stats"] = unpack_bn_state(tree["batch_stats"], size)
    if "opt_state" in tree:
        tree["opt_state"] = _map_params_like(tree["opt_state"], fix)
    return tree


def _packify_train_tree(tree: Dict, state) -> Dict:
    """Canonical loaded tree -> packed layout iff the runtime `state` is
    packed (resume path). Already-packed trees pass through."""
    from r3m_tpu.models.resnet import (
        infer_resnet_size,
        is_packed,
        pack_bn_params,
        pack_bn_state,
    )

    if not is_packed(state.params.get("convnet")):
        return tree
    conv = tree["params"].get("convnet")
    if conv is None or is_packed(conv):
        return tree
    size = infer_resnet_size(conv)

    def fix(params_like):
        if not is_packed(params_like.get("convnet", {"bn_packed": 0})):
            params_like = dict(params_like)
            params_like["convnet"] = pack_bn_params(params_like["convnet"], size)
        return params_like

    tree = dict(tree)
    tree["params"] = fix(tree["params"])
    tree["batch_stats"] = pack_bn_state(tree["batch_stats"], size)
    if "opt_state" in tree:
        tree["opt_state"] = _map_params_like(tree["opt_state"], fix)
    return tree


# ---------------------------------------------------------------------------
# Train-state snapshots (rolling + per-step, reference layout)
# ---------------------------------------------------------------------------


def save_train_snapshot(
    work_dir: str, state, cfg=None, keep_step_copy=True, extra_meta=None
) -> str:
    """Reference layout (train_representation.py:123-130): per-eval
    snapshot_{step}.npz plus the rolling snapshot.npz, both carrying
    identical metadata (global_step, config) so either resumes correctly.

    The state is serialized ONCE; the rolling file is a hardlink (copy on
    filesystems without link support) of the step copy — the reference
    torch.saves the ~GB payload twice per snapshot event.

    `extra_meta`: JSON-able run facts beyond the model config (e.g. the
    pipeline's `lang_max_len`, which the reward-serving path must match)."""
    import shutil

    from r3m_tpu.training.trainer import TrainState  # noqa: F401 (doc link)

    step = int(np.asarray(state.step))
    tree = canonicalize_train_tree(
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "key": state.key,
        }
    )
    meta = {"global_step": step}
    if cfg is not None:
        meta["config"] = dataclasses.asdict(cfg)
    if extra_meta:
        meta.update(extra_meta)
    rolling = os.path.join(work_dir, "snapshot.npz")
    if not keep_step_copy:
        save_snapshot(rolling, tree, meta)
        return rolling
    step_path = os.path.join(work_dir, f"snapshot_{step}.npz")
    save_snapshot(step_path, tree, meta)
    tmp = rolling + ".tmp"
    if os.path.exists(tmp):
        os.remove(tmp)
    try:
        os.link(step_path, tmp)
    except OSError:  # cross-device or no-hardlink filesystem
        shutil.copyfile(step_path, tmp)
    os.replace(tmp, rolling)
    return rolling


class AsyncSnapshotWriter:
    """Overlap snapshot serialization + disk writes with training.

    The reference's `save_snapshot` (train_representation.py:123-130)
    blocks the loop for the full torch.save; here only the device->host
    copy is synchronous — it MUST happen before the next step is
    dispatched, because the jitted step donates the state buffers — and
    the (dominant) npz serialization + write runs in a worker thread.
    At most one write is in flight; a failed write surfaces on the next
    submit()/wait() rather than being silently dropped.
    """

    def __init__(self):
        self._thread = None
        self._err: Optional[BaseException] = None

    def submit(self, fn) -> None:
        """Run `fn()` (a fully host-side write) in the background."""
        import threading

        self.wait()

        def run():
            try:
                fn()
            except BaseException as e:  # surfaced on next wait()
                self._err = e

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        """Join the in-flight write; raise if it failed."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("async snapshot write failed") from err


def step_snapshots(work_dir: str):
    """Step-numbered snapshots in `work_dir`, newest first: [(step, path)].

    Only ``snapshot_{step}.npz`` basenames participate — user-named copies
    (e.g. snapshot_best.npz) are ignored, and matching on the basename keeps
    directory names from poisoning the pattern. Shared by auto-resume
    fallback and retention pruning.
    """
    import glob
    import re

    out = []
    for p in glob.glob(os.path.join(work_dir, "snapshot_*.npz")):
        m = re.fullmatch(r"snapshot_(\d+)\.npz", os.path.basename(p))
        if m:
            out.append((int(m.group(1)), p))
    return sorted(out, reverse=True)


def r3m_config_from_meta(meta: Dict, **overrides):
    """Rebuild an R3MConfig from snapshot metadata (filtered to known fields)."""
    import warnings

    from r3m_tpu.models.r3m import R3MConfig

    cfg_dict = dict(meta.get("config") or {})
    cfg_dict.update(overrides)
    cfg_dict = {
        k: v for k, v in cfg_dict.items() if k in R3MConfig.__dataclass_fields__
    }
    # Backbone-mismatched runtime levers (remat on ViT, vit_fused_attn on
    # ResNet) are rejected by R3MConfig.__post_init__ for fresh configs, but
    # older snapshots may carry them from when they were silent no-ops — a
    # checkpoint that loaded yesterday must still load, so coerce + warn
    # instead of refusing (they never affected the saved weights).
    size = cfg_dict.get("size", R3MConfig.size)
    for field, default, ok_values, bad in (
        ("remat", "none", ("none",), size == 0),
        # "auto" self-resolves to the einsum path on ResNet — not a
        # mismatch, don't warn (it is the field's default since round 4)
        ("vit_fused_attn", False, (False, "auto"), size != 0),
    ):
        if bad and cfg_dict.get(field, default) not in ok_values:
            warnings.warn(
                f"snapshot config carries {field}={cfg_dict[field]!r}, which "
                f"does not apply to size={size}; ignoring it"
            )
            cfg_dict[field] = default
    return R3MConfig(**cfg_dict)


def restore_like(saved, ref):
    """Rebuild `saved` with `ref`'s pytree structure and dtypes.

    NamedTuples (e.g. optax's ScaleByAdamState) serialize as plain lists;
    this restores them through `ref`'s treedef.
    """
    import jax.numpy as jnp

    ref_leaves, treedef = jax.tree_util.tree_flatten(ref)
    saved_leaves = jax.tree_util.tree_leaves(saved)
    if len(saved_leaves) != len(ref_leaves):
        raise ValueError(
            f"snapshot/state leaf-count mismatch: {len(saved_leaves)} vs "
            f"{len(ref_leaves)}"
        )
    out = []
    for i, (s, r) in enumerate(zip(saved_leaves, ref_leaves)):
        s = jnp.asarray(s, dtype=r.dtype)
        if jnp.shape(s) != jnp.shape(r):
            raise ValueError(
                f"snapshot/state shape mismatch at leaf {i}: "
                f"{jnp.shape(s)} vs {jnp.shape(r)} — the snapshot was saved "
                "from a different architecture/config than the restoring state"
            )
        out.append(s)
    return jax.tree_util.tree_unflatten(treedef, out)


def load_train_snapshot(path: str, state, with_meta: bool = False):
    """Restore a TrainState from a snapshot, preserving pytree dtypes.

    `with_meta=True` returns ``(state, meta)`` — one npz read serves both
    the weights and run facts like the data-stream resume counters."""
    from r3m_tpu.training.trainer import TrainState
    import jax.numpy as jnp

    tree, meta = load_snapshot(path)
    step = int(meta.get("global_step", 0))
    tree = _packify_train_tree(tree, state)

    new_state = TrainState(
        params=restore_like(tree["params"], state.params),
        batch_stats=restore_like(tree["batch_stats"], state.batch_stats),
        opt_state=restore_like(tree["opt_state"], state.opt_state),
        step=jnp.asarray(step, jnp.int32),
        key=jnp.asarray(tree["key"], state.key.dtype),
    )
    return (new_state, meta) if with_meta else new_state


# ---------------------------------------------------------------------------
# Reference (torch) checkpoint import
# ---------------------------------------------------------------------------


def load_torch_payload(path: str):
    """Guarded ``torch.load`` of a reference artifact (model.pt/snapshot.pt).

    Returns the raw pickled payload. Shared by the converter and the
    verify_parity CLI so both tolerate the same artifact generations.
    """
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        # Retry the unsafe path ONLY for weights_only rejections (payloads
        # with non-tensor globals, e.g. OmegaConf nodes in old snapshots);
        # a corrupt/truncated file raises UnpicklingError too, but without
        # the weights_only wording — it must surface its real error, not a
        # second confusing one from the full unpickler.
        msg = str(e)
        if "weights_only" not in msg and "Weights only" not in msg:
            raise
        return torch.load(path, map_location="cpu", weights_only=False)


def torch_payload_state_dict(payload) -> Dict:
    """Extract the model state dict from a reference payload
    (``{"r3m": sd, "global_step": ...}`` for snapshots, bare sd for
    model.pt — train_representation.py:123-138)."""
    if isinstance(payload, dict) and "r3m" in payload:
        return payload["r3m"]
    return payload


def load_torch_checkpoint(path: str, include_language: bool = False) -> Dict:
    """Load a reference ``model.pt``/``snapshot.pt`` into JAX pytrees.

    Returns `convert.convert_r3m_torch_state` bundle + "global_step" if the
    payload carries one (train_representation.py:129).
    """
    from r3m_tpu.convert import convert_r3m_torch_state

    payload = load_torch_payload(path)
    sd = torch_payload_state_dict(payload)
    bundle = convert_r3m_torch_state(sd, include_language=include_language)
    if isinstance(payload, dict) and "global_step" in payload:
        bundle["global_step"] = int(payload["global_step"])
    return bundle


def import_torch_snapshot_to_state(path: str, state):
    """Seed a TrainState's weights from a reference torch snapshot.

    Continues reference-trained runs on TPU: convnet params/BN stats (and
    lang_rew when both sides have it) are imported; the Adam moments are
    NOT transferable (torch module-state vs optax pytrees), so the
    optimizer restarts fresh — the standard cross-framework resume
    semantics. `global_step` is restored when the payload carries one
    (train_representation.py:129).
    """
    has_lang = "lang_rew" in state.params
    bundle = load_torch_checkpoint(path, include_language=has_lang)
    return import_bundle_to_state(bundle, state)


def import_bundle_to_state(bundle: Dict, state):
    """Seed a TrainState from an already-converted torch bundle (callers
    that just loaded it — e.g. the convert CLI — skip a second multi-GB
    torch.load + conversion)."""
    import jax.numpy as jnp

    from r3m_tpu.models.resnet import (
        infer_resnet_size,
        is_packed,
        pack_bn_params,
        pack_bn_state,
    )

    has_lang = "lang_rew" in state.params

    conv_params = bundle["convnet"]["params"]
    conv_stats = bundle["convnet"]["batch_stats"]
    if is_packed(state.params["convnet"]) and not is_packed(conv_params):
        size = infer_resnet_size(conv_params)
        conv_params = pack_bn_params(conv_params, size)
        conv_stats = pack_bn_state(conv_stats, size)

    params = dict(state.params)
    params["convnet"] = restore_like(conv_params, state.params["convnet"])
    if has_lang:
        if bundle.get("lang_rew") is None:
            raise ValueError("state expects lang_rew but torch snapshot has none")
        params["lang_rew"] = restore_like(
            bundle["lang_rew"], state.params["lang_rew"]
        )
    return state._replace(
        params=params,
        batch_stats=restore_like(conv_stats, state.batch_stats),
        step=jnp.asarray(bundle.get("global_step", 0), jnp.int32),
    )


def export_torch_snapshot(path: str, state, size: int, data_parallel: bool = True) -> str:
    """Write a TrainState as a REFERENCE-format torch snapshot.

    Produces the pickled ``{"r3m": state_dict, "global_step": int}`` payload
    of train_representation.py:123-130 (keys ``module.convnet.*`` /
    ``module.lang_rew.*``), so a TPU-trained model round-trips back into the
    reference's `load_snapshot` / `load_r3m` torch stack.
    """
    import torch

    from r3m_tpu.convert import export_r3m_torch_state

    tree = canonicalize_train_tree(
        {"params": state.params, "batch_stats": state.batch_stats}
    )
    params = jax.tree_util.tree_map(np.asarray, tree["params"])
    stats = jax.tree_util.tree_map(np.asarray, tree["batch_stats"])
    sd = export_r3m_torch_state(params, stats, size, data_parallel=data_parallel)
    payload = {
        # copy: jax-backed buffers are non-writable, from_numpy would warn
        # and alias memory the caller may donate
        "r3m": {k: torch.tensor(np.asarray(v)) for k, v in sd.items()},
        "global_step": int(np.asarray(state.step)),
    }
    tmp = path + ".tmp"
    torch.save(payload, tmp)
    os.replace(tmp, path)
    return path
