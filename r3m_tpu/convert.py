"""PyTorch checkpoint -> JAX pytree converters.

The reference distributes pretrained weights as pickled torch state dicts
(``/root/reference/r3m/__init__.py:73`` loads ``torch.load(model.pt)['r3m']``,
whose keys carry a ``module.`` DataParallel prefix, e.g.
``module.convnet.layer1.0.conv1.weight``). These converters map that naming
onto the nested-dict pytrees used by `r3m_tpu.models.*`, handling the layout
changes (torch conv OIHW -> JAX HWIO, torch linear [out,in] -> [in,out]).

Everything operates on numpy arrays so it runs host-side with no device
transfers; `torch` is only needed by the caller that unpickles the file
(see `r3m_tpu.checkpoint.load_torch_checkpoint`).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Any]


def _np(t) -> Array:
    """torch.Tensor | np.ndarray -> float32 numpy array (host).

    Alias of the ONE converter law in models/layers.py:torch_to_np, so a
    dtype/layout fix there reaches every import path (ViT/DistilBERT use
    layers.py directly; the resnet/lang_rew converters below use this)."""
    from r3m_tpu.models.layers import torch_to_np

    return torch_to_np(t)


def strip_prefix(sd: StateDict, prefix: str = "module.") -> Dict[str, Any]:
    """Remove a key prefix (DataParallel adds ``module.``)."""
    out = {}
    for k, v in sd.items():
        out[k[len(prefix):] if k.startswith(prefix) else k] = v
    return out


def remove_language_head(sd: StateDict) -> Dict[str, Any]:
    """Drop lang_enc/lang_rew entries (reference r3m/__init__.py:35-42)."""
    return {
        k: v for k, v in sd.items() if "lang_enc" not in k and "lang_rew" not in k
    }


def _conv_w(t) -> Array:
    """OIHW -> HWIO."""
    return np.transpose(_np(t), (2, 3, 1, 0))


def _bn(sd: StateDict, key: str) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    params = {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}
    state = {
        "mean": _np(sd[f"{key}.running_mean"]),
        "var": _np(sd[f"{key}.running_var"]),
    }
    return params, state


def convert_resnet(sd: StateDict, size: int, prefix: str = "") -> Tuple[Dict, Dict]:
    """torchvision-style resnet state dict -> (params, batch_stats) pytrees.

    `prefix` selects a sub-module, e.g. ``convnet.`` for R3M checkpoints.
    """
    from r3m_tpu.models.resnet import RESNET_SPECS  # local import, no cycle

    spec = RESNET_SPECS[size]
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)} if prefix else dict(sd)

    params: Dict[str, Any] = {"conv1": {"w": _conv_w(sub["conv1.weight"])}}
    state: Dict[str, Any] = {}
    params["bn1"], state["bn1"] = _bn(sub, "bn1")

    n_convs = 2 if spec.block == "basic" else 3
    for stage, num_blocks in enumerate(spec.stage_sizes):
        layer = f"layer{stage + 1}"
        blocks_p, blocks_s = [], []
        for b in range(num_blocks):
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            base = f"{layer}.{b}"
            for ci in range(1, n_convs + 1):
                bp[f"conv{ci}"] = {"w": _conv_w(sub[f"{base}.conv{ci}.weight"])}
                bp[f"bn{ci}"], bs[f"bn{ci}"] = _bn(sub, f"{base}.bn{ci}")
            if f"{base}.downsample.0.weight" in sub:
                ds_bn_p, ds_bn_s = _bn(sub, f"{base}.downsample.1")
                bp["downsample"] = {
                    "conv": {"w": _conv_w(sub[f"{base}.downsample.0.weight"])},
                    "bn": ds_bn_p,
                }
                bs["downsample"] = {"bn": ds_bn_s}
            blocks_p.append(bp)
            blocks_s.append(bs)
        params[layer] = blocks_p
        state[layer] = blocks_s
    return params, state


def convert_linear(sd: StateDict, key: str) -> Dict[str, Array]:
    """torch nn.Linear -> {"w": [in,out], "b": [out]}.

    Same law as models/layers.py:convert_linear (delegates to it when a
    bias exists); this wrapper additionally accepts bias-free Linears."""
    if f"{key}.bias" in sd:
        from r3m_tpu.models.layers import convert_linear as _shared

        return dict(_shared(sd, key))
    return {"w": np.transpose(_np(sd[f"{key}.weight"]))}


def convert_language_reward(sd: StateDict, prefix: str = "lang_rew.") -> Dict:
    """LanguageReward 5-layer MLP (reference models_language.py:43-51).

    torch Sequential indices 0,2,4,6,8 are the Linear layers.
    """
    layers = []
    for idx in (0, 2, 4, 6, 8):
        layers.append(convert_linear(sd, f"{prefix}pred.{idx}"))
    return {"layers": layers}


def detect_resnet_size(sd: StateDict, prefix: str = "") -> int:
    """Infer 18/34/50 from state-dict structure."""
    keys = set(sd.keys())
    if f"{prefix}layer1.0.conv3.weight" in keys:
        return 50
    # basic blocks: count blocks in layer3 — resnet18 has 2, resnet34 has 6
    n = len({m.group(1) for k in keys for m in [re.match(re.escape(prefix) + r"layer3\.(\d+)\.", k)] if m})
    return 34 if n == 6 else 18


def convert_r3m_torch_state(
    sd: StateDict, size: int | None = None, include_language: bool = False
) -> Dict[str, Any]:
    """Full R3M snapshot state dict -> pytree bundle.

    Accepts the raw `payload['r3m']` mapping from a reference snapshot
    (with or without ``module.`` prefixes). Returns::

        {"convnet": {"params": ..., "batch_stats": ...},
         "lang_rew": {...} | None, "size": int}
    """
    sd = strip_prefix(dict(sd))
    if "convnet.embeddings.cls_token" in sd:
        # reference size==0 branch: convnet is an HF ViTModel
        # (models_r3m.py:52-56); no BN state, architecture inferred from
        # parameter shapes
        from r3m_tpu.models.vit import (
            convert_vit,
            require_b32_geometry,
            vit_config_from_state,
        )

        enc_sd = {
            k[len("convnet."):]: v for k, v in sd.items() if k.startswith("convnet.")
        }
        vcfg = vit_config_from_state(enc_sd)
        # converting anything but B/32 would only defer the failure to an
        # opaque shape error at forward time (guard lives in vit.py, next
        # to the n_heads heuristic it protects)
        require_b32_geometry(vcfg)
        params, state = convert_vit(enc_sd, vcfg), {}
        size = 0
    else:
        if size is None:
            size = detect_resnet_size(sd, prefix="convnet.")
        params, state = convert_resnet(sd, size, prefix="convnet.")
    bundle: Dict[str, Any] = {
        "convnet": {"params": params, "batch_stats": state},
        "size": size,
        "lang_rew": None,
        "lang_enc": None,
    }
    if size == 0:
        # serving needs the crop size the pos-embedding table was built for
        bundle["image_size"] = vcfg.image_size
    if include_language:
        bundle.update(convert_language_stack(sd))
    return bundle


def convert_language_stack(sd: StateDict) -> Dict[str, Any]:
    """Language parts of an (already prefix-stripped) R3M snapshot.

    Returns ``{"lang_rew": ... | None, "lang_enc": ... | None}`` without
    touching the vision tower — usable on its own when only the language
    stack is needed (e.g. verify_parity's torch-reference side).
    """
    out: Dict[str, Any] = {"lang_rew": None, "lang_enc": None}
    if all(
        f"lang_rew.pred.{i}.{p}" in sd for i in (0, 2, 4, 6, 8) for p in ("weight", "bias")
    ):
        # require the complete 5-layer head: stray/truncated lang_rew keys
        # (e.g. an artifact partially stripped by remove_language_head) are
        # treated as "no language head", not a conversion error
        out["lang_rew"] = convert_language_reward(sd)
    # language-trained reference snapshots embed the (frozen) DistilBERT
    # itself: R3M registers LangEncoder as a submodule, so
    # model.state_dict() carries `lang_enc.model.*` (the full HF
    # DistilBertModel — models_r3m.py:70, train_representation.py:127)
    enc_prefix = "lang_enc.model."
    enc_sd = {
        k[len(enc_prefix):]: v for k, v in sd.items() if k.startswith(enc_prefix)
    }
    if enc_sd:
        from r3m_tpu.models.distilbert import (
            convert_distilbert,
            distilbert_config_from_state,
        )

        cfg = distilbert_config_from_state(enc_sd)
        out["lang_enc"] = {
            "params": convert_distilbert(enc_sd, cfg),
            "cfg": cfg,
        }
    return out


# ---------------------------------------------------------------------------
# Inverse direction: JAX pytrees -> reference-format torch state dicts, so a
# TPU-trained model can be loaded back by the reference's `load_r3m` /
# `load_snapshot` (r3m/__init__.py:73, train_representation.py:132-138).
# ---------------------------------------------------------------------------


def _conv_w_inv(w) -> Array:
    """HWIO -> OIHW."""
    return np.ascontiguousarray(np.transpose(np.asarray(w, np.float32), (3, 2, 0, 1)))


def _bn_out(sd: Dict[str, Array], key: str, p: Mapping, s: Mapping) -> None:
    sd[f"{key}.weight"] = np.asarray(p["scale"], np.float32)
    sd[f"{key}.bias"] = np.asarray(p["bias"], np.float32)
    sd[f"{key}.running_mean"] = np.asarray(s["mean"], np.float32)
    sd[f"{key}.running_var"] = np.asarray(s["var"], np.float32)
    # torchvision BN tracks batch count; our pytrees don't. Zero is inert
    # (only read under momentum=None) but required by strict state loads.
    sd[f"{key}.num_batches_tracked"] = np.zeros((), np.int64)


def export_resnet(
    params: Mapping, batch_stats: Mapping, size: int, prefix: str = ""
) -> Dict[str, Array]:
    """(params, batch_stats) pytrees -> torchvision-style resnet state dict."""
    from r3m_tpu.models.resnet import RESNET_SPECS

    spec = RESNET_SPECS[size]
    sd: Dict[str, Array] = {f"{prefix}conv1.weight": _conv_w_inv(params["conv1"]["w"])}
    _bn_out(sd, f"{prefix}bn1", params["bn1"], batch_stats["bn1"])
    n_convs = 2 if spec.block == "basic" else 3
    for stage, num_blocks in enumerate(spec.stage_sizes):
        layer = f"layer{stage + 1}"
        for b in range(num_blocks):
            bp, bs = params[layer][b], batch_stats[layer][b]
            base = f"{prefix}{layer}.{b}"
            for ci in range(1, n_convs + 1):
                sd[f"{base}.conv{ci}.weight"] = _conv_w_inv(bp[f"conv{ci}"]["w"])
                _bn_out(sd, f"{base}.bn{ci}", bp[f"bn{ci}"], bs[f"bn{ci}"])
            if "downsample" in bp:
                sd[f"{base}.downsample.0.weight"] = _conv_w_inv(
                    bp["downsample"]["conv"]["w"]
                )
                _bn_out(
                    sd, f"{base}.downsample.1",
                    bp["downsample"]["bn"], bs["downsample"]["bn"],
                )
    return sd


def export_linear(p: Mapping, key: str, sd: Dict[str, Array]) -> None:
    """{"w": [in,out], "b": [out]} -> torch nn.Linear entries."""
    sd[f"{key}.weight"] = np.ascontiguousarray(
        np.transpose(np.asarray(p["w"], np.float32))
    )
    if "b" in p:
        sd[f"{key}.bias"] = np.asarray(p["b"], np.float32)


def export_language_reward(lang_rew: Mapping, prefix: str = "lang_rew.") -> Dict:
    sd: Dict[str, Array] = {}
    for i, layer in zip((0, 2, 4, 6, 8), lang_rew["layers"]):
        export_linear(layer, f"{prefix}pred.{i}", sd)
    return sd


def export_r3m_torch_state(
    params: Mapping,
    batch_stats: Mapping,
    size: int,
    data_parallel: bool = True,
) -> Dict[str, Array]:
    """R3M pytrees -> the reference's snapshot state-dict naming.

    `data_parallel=True` adds the ``module.`` prefix the reference's
    DataParallel wrapper expects (r3m/__init__.py:72-74). With the default
    inference config (langweight=0 after cleanup_config) the reference R3M
    holds only `convnet.*` parameters, so a language head is exported only
    when present AND the caller keeps it — `remove_language_head` strips it
    at reference load time anyway.
    """
    pre = "module." if data_parallel else ""
    if size == 0:
        from r3m_tpu.models.vit import export_vit

        sd = {f"{pre}convnet.{k}": v for k, v in export_vit(params["convnet"]).items()}
    else:
        sd = export_resnet(params["convnet"], batch_stats, size, prefix=f"{pre}convnet.")
    if params.get("lang_rew") is not None:
        sd.update(export_language_reward(params["lang_rew"], prefix=f"{pre}lang_rew."))
    return sd


# ---------------------------------------------------------------------------
# CLI: snapshot conversion in both directions
# ---------------------------------------------------------------------------


def main(argv=None) -> int:
    """Convert checkpoints between the reference torch format and native npz.

        python -m r3m_tpu.convert to-native snapshot.pt out.npz
        python -m r3m_tpu.convert to-torch  snapshot.npz out.pt

    to-native seeds a fresh optimizer (torch Adam state is not portable);
    to-torch writes the reference's pickled {"r3m", "global_step"} payload
    (module.convnet.* naming, OIHW) loadable by its train_representation /
    load_r3m stack.
    """
    import argparse
    from types import SimpleNamespace

    import numpy as np

    from r3m_tpu.utils.misc import honor_jax_platforms_env

    honor_jax_platforms_env()
    p = argparse.ArgumentParser(description=main.__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    tn = sub.add_parser("to-native", help="torch snapshot/model.pt -> .npz")
    tn.add_argument("src")
    tn.add_argument("out")
    tt = sub.add_parser("to-torch", help="native .npz snapshot -> torch .pt")
    tt.add_argument("src")
    tt.add_argument("out")
    args = p.parse_args(argv)

    if args.cmd == "to-native":
        import dataclasses

        import jax

        from r3m_tpu.checkpoint import (
            canonicalize_train_tree,
            import_bundle_to_state,
            load_torch_checkpoint,
            save_snapshot,
        )
        from r3m_tpu.models.r3m import R3MConfig
        from r3m_tpu.training.trainer import create_train_state

        bundle = load_torch_checkpoint(args.src, include_language=True)
        cfg = R3MConfig(
            size=bundle["size"],
            langweight=1.0 if bundle.get("lang_rew") is not None else 0.0,
            # a ViT's pos-embedding table fixes the crop size; the template
            # state (and its optimizer moments) must be built to match
            image_size=bundle.get("image_size", R3MConfig.image_size),
        )
        state = import_bundle_to_state(
            bundle, create_train_state(cfg, jax.random.PRNGKey(0))
        )
        save_snapshot(
            args.out,
            # on-disk snapshots are ALWAYS canonical per-layer BN layout
            # (checkpoint.py contract); the template state may be packed
            canonicalize_train_tree(
                {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                    "key": state.key,
                }
            ),
            {
                "global_step": int(np.asarray(state.step)),
                "config": dataclasses.asdict(cfg),
            },
        )
    else:
        from r3m_tpu.checkpoint import (
            export_torch_snapshot,
            load_snapshot,
            r3m_config_from_meta,
        )

        tree, meta = load_snapshot(args.src)
        cfg = r3m_config_from_meta(meta)
        export_torch_snapshot(
            args.out,
            SimpleNamespace(
                params=tree["params"],
                batch_stats=tree.get("batch_stats", {}),
                step=np.asarray(meta.get("global_step", 0)),
            ),
            size=cfg.size,
        )
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
