"""r3m_tpu — TPU-native R3M: pretraining + pretrained visual representations.

Public API mirroring the reference package (``/root/reference/r3m/
__init__.py``): `load_r3m(modelid)` / `load_r3m_reproduce(modelid)` return
a callable image->embedding module from the published pretrained
checkpoints (converted from torch on the fly), and `R3M`/`R3MConfig`
expose the model for training.
"""

from __future__ import annotations

from typing import Any, Dict

from r3m_tpu.convert import remove_language_head  # noqa: F401 (parity export)
from r3m_tpu.models.r3m import (  # noqa: F401
    R3MConfig,
    R3MEncoder,
    r3m_embed,
    r3m_init,
    sim,
)

__version__ = "0.1.0"

__all__ = [
    "R3M",
    "R3MConfig",
    "R3MEncoder",
    "R3MRewardModel",
    "VALID_ARGS",
    "bc_probe",
    "cleanup_config",
    "load_r3m",
    "load_r3m_from_files",
    "load_r3m_from_snapshot",
    "load_r3m_reproduce",
    "r3m_embed",
    "r3m_init",
    "remove_language_head",
    "sim",
]


def __getattr__(name: str):
    """Lazy re-exports of the downstream-eval APIs (keeps base import light)."""
    if name == "R3MRewardModel":
        from r3m_tpu.reward import R3MRewardModel

        return R3MRewardModel
    if name == "bc_probe":
        from r3m_tpu.evalsuite.bc import bc_probe

        return bc_probe
    raise AttributeError(f"module 'r3m_tpu' has no attribute {name!r}")

# Constructor args accepted from checkpoint configs (r3m/__init__.py:15).
VALID_ARGS = [
    "_target_",
    "device",
    "lr",
    "hidden_dim",
    "size",
    "l2weight",
    "l1weight",
    "langweight",
    "tcnweight",
    "l2dist",
    "bs",
]

# torch-API-compat alias: reference exports the model class as `R3M`.
R3M = R3MEncoder


def cleanup_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Sanitize a checkpoint's config node (r3m/__init__.py:21-33).

    Filters to VALID_ARGS and forces langweight=0 — downstream use is as a
    visual representation, so the language head is dropped.
    """
    agent = dict(cfg.get("agent", cfg))
    agent = {k: v for k, v in agent.items() if k in VALID_ARGS}
    agent["langweight"] = 0
    agent.pop("_target_", None)
    agent.pop("device", None)
    return agent


def _load_from_artifacts(
    modelpath: str, configpath: str, mesh=None, precision: str = "parity"
) -> R3MEncoder:
    import dataclasses

    import yaml

    from r3m_tpu.checkpoint import load_torch_checkpoint
    from r3m_tpu.utils.config import _resolve, agent_to_r3m_config

    with open(configpath) as f:
        raw_cfg = yaml.safe_load(f) or {}
    agent = cleanup_config(raw_cfg)
    # Real checkpoint folders ship the TRAINING config, whose agent node
    # contains OmegaConf interpolations ('lr: ${lr}', 'bs: ${batch_size}' —
    # /root/reference/r3m/cfgs/config_rep.yaml:33,41); the reference
    # resolves them with OmegaConf (r3m/__init__.py:69-70). Resolve against
    # the root config here, dropping values whose referent is absent
    # (hydra-launcher-only keys) so a literal '${lr}' string can never
    # reach R3MConfig.
    resolved: Dict[str, Any] = {}
    for k, v in agent.items():
        try:
            v = _resolve(v, raw_cfg)
        except (KeyError, ValueError):
            continue
        if isinstance(v, str) and "${" in v:
            continue  # unsupported resolver form (e.g. ${oc.env:...})
        resolved[k] = v
    bundle = load_torch_checkpoint(modelpath, include_language=False)
    # agent_to_r3m_config also coerces pyyaml's stringly scalars
    # ('1e-4' -> float), matching OmegaConf's typed parse.
    cfg = dataclasses.replace(
        agent_to_r3m_config(resolved),
        size=bundle["size"],  # trust the weights over the config
        langweight=0.0,
        **(
            # same principle for a ViT's crop size (pos-table-determined)
            {"image_size": bundle["image_size"]} if "image_size" in bundle else {}
        ),
    )
    return R3MEncoder(
        cfg,
        params={"convnet": bundle["convnet"]["params"]},
        batch_stats=bundle["convnet"]["batch_stats"],
        mesh=mesh,
        precision=precision,
    )


def load_r3m(modelid: str, mesh=None, precision: str = "parity") -> R3MEncoder:
    """Load a pretrained R3M visual encoder ("resnet50"/"resnet34"/"resnet18").

    Same registry + ``~/.r3m`` cache layout as the reference
    (r3m/__init__.py:44-75); weights are converted from the published torch
    checkpoints. The returned module is called with NCHW images in
    [0, 255] and returns [B, out_dim] embeddings.

    `precision="parity"` (default) serves f32/HIGHEST — the lowering all
    parity checks were taken with. `precision="fast"` serves the same
    folded weights in bfloat16 for throughput-critical loops (measured
    4.0× the parity path's device rate on resnet50 at cosine ≥ 0.9999
    vs parity — BASELINE.md round-4 fast-serving row).
    """
    from r3m_tpu.fetch import ensure_artifacts

    modelpath, configpath = ensure_artifacts(modelid, reproduce=False)
    return _load_from_artifacts(modelpath, configpath, mesh=mesh, precision=precision)


def load_r3m_reproduce(
    modelid: str, mesh=None, precision: str = "parity"
) -> R3MEncoder:
    """Load paper-reproduction checkpoints ("r3m"/"r3m_noaug"/"r3m_nol1"/
    "r3m_nolang") — r3m/__init__.py:77-113 (with its `modelif` typo fixed,
    making r3m_nol1 / r3m_nolang actually loadable)."""
    from r3m_tpu.fetch import ensure_artifacts

    modelpath, configpath = ensure_artifacts(modelid, reproduce=True)
    return _load_from_artifacts(modelpath, configpath, mesh=mesh, precision=precision)


def load_r3m_from_files(
    modelpath: str, configpath: str = None, mesh=None, precision: str = "parity"
) -> R3MEncoder:
    """Load from explicit artifact paths (offline hosts, local snapshots)."""
    if modelpath.endswith(".npz"):
        return load_r3m_from_snapshot(modelpath, mesh=mesh, precision=precision)
    if configpath is not None:
        return _load_from_artifacts(
            modelpath, configpath, mesh=mesh, precision=precision
        )
    from r3m_tpu.checkpoint import load_torch_checkpoint

    bundle = load_torch_checkpoint(modelpath, include_language=False)
    cfg = R3MConfig(
        size=bundle["size"],
        langweight=0,
        # ViT snapshots fix the crop size via their pos-embedding table
        image_size=bundle.get("image_size", R3MConfig.image_size),
    )
    return R3MEncoder(
        cfg,
        params={"convnet": bundle["convnet"]["params"]},
        batch_stats=bundle["convnet"]["batch_stats"],
        mesh=mesh,
        precision=precision,
    )


def load_r3m_from_snapshot(
    path: str, mesh=None, precision: str = "parity"
) -> R3MEncoder:
    """Embedding inference from a NATIVE training snapshot (.npz).

    The architecture comes from the snapshot's config metadata; the
    language head (if any) is dropped — same downstream-use semantics as
    `load_r3m` (cleanup_config forces langweight=0, r3m/__init__.py:30).
    """
    from r3m_tpu.checkpoint import load_snapshot, r3m_config_from_meta

    tree, meta = load_snapshot(path)
    if not meta.get("config"):
        # without it r3m_config_from_meta would silently default to
        # resnet50 and fail deep in BN folding on any other backbone
        raise ValueError(
            f"snapshot {path!r} carries no 'config' metadata; write it via "
            "workspace snapshots or save_snapshot(..., meta={'config': "
            "dataclasses.asdict(cfg), ...}) so the architecture can be "
            "rebuilt"
        )
    # serving is always f32 regardless of the training compute dtype
    cfg = r3m_config_from_meta(meta, langweight=0, compute_dtype="float32")
    return R3MEncoder(
        cfg,
        params={"convnet": tree["params"]["convnet"]},
        batch_stats=tree.get("batch_stats", {}),
        mesh=mesh,
        precision=precision,
    )
