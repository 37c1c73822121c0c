"""One-command parity check: published torch checkpoint vs the TPU build.

    python -m r3m_tpu.verify_parity <model.pt> [config.yaml] [--images N]

Loads the artifact twice — through this package's converter chain
(`load_r3m_from_files`, the path behind `load_r3m`,
``/root/reference/r3m/__init__.py:44-75``) and through an executable torch
reference forward (real torchvision when installed, else the
architecture-faithful oracle in `r3m_tpu.torch_oracle`) — runs both on the
same seeded images with the reference's preprocessing, and prints one JSON
line of cosine statistics against the BASELINE.json bar (>= 0.999).

The environment this framework was built in has no network egress, so the
actual Google-Drive ``model.pt`` artifacts could never be fetched; this CLI
makes the north-star parity number mechanical the moment the artifacts are
available:

    python -m r3m_tpu.fetch resnet50   # or any pre-downloaded model.pt
    python -m r3m_tpu.verify_parity ~/.r3m/r3m_50/model.pt ~/.r3m/r3m_50/config.yaml
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Dict, Optional

import numpy as np

COSINE_BAR = 0.999  # BASELINE.json north-star parity bar


def _load_torch_reference_state(modelpath: str):
    """One shared unpickle for the torch-reference side of the check.

    Deliberately separate from the `load_r3m_from_files` load — that one is
    the production serving path this CLI exists to validate and must stay
    independent — but shared between the vision and language reference
    helpers (real language snapshots are GB-scale; one unpickle, not two).
    Returns the prefix-stripped state dict, or None when torch is absent.
    """
    try:
        import torch  # noqa: F401  (torch unpickling backs the payload load)
    except ImportError:
        return None
    from r3m_tpu.checkpoint import load_torch_payload, torch_payload_state_dict
    from r3m_tpu.convert import strip_prefix

    try:
        payload = load_torch_payload(modelpath)
    except Exception as torch_err:
        # Native .npz snapshots are valid CLI inputs (the converter side
        # serves them) but carry no torch-reference weights; degrade to
        # convert-only mode instead of dying on the unpickler's message.
        # Anything that is neither a torch pickle nor an npz re-raises.
        try:
            np.load(modelpath, allow_pickle=False).close()
        except Exception:
            raise torch_err
        print(
            f"[verify_parity] {modelpath} is a native snapshot, not a torch "
            "artifact — torch-reference forward skipped",
            file=sys.stderr,
        )
        return None
    return strip_prefix(torch_payload_state_dict(payload))


def _torch_forward(full_sd, images: np.ndarray) -> Optional[np.ndarray]:
    """Reference-style forward: torch model + /255 + ImageNet normalize.

    Returns None when torch is unavailable (conversion-only mode).
    """
    try:
        import torch

        from r3m_tpu.torch_oracle import torch_resnet
    except ImportError:
        return None
    from r3m_tpu.convert import detect_resnet_size, remove_language_head

    sd = remove_language_head(dict(full_sd))
    sd = {k[len("convnet."):]: v for k, v in sd.items() if k.startswith("convnet.")}
    if "embeddings.cls_token" in sd:
        return _torch_vit_forward(sd, images)
    size = detect_resnet_size(sd)
    model = torch_resnet(size).eval()
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # num_batches_tracked keys are absent from hand-rolled oracles; anything
    # else missing means the torch side cannot serve as a reference
    real_missing = [k for k in missing if not k.endswith("num_batches_tracked")]
    if real_missing or unexpected:
        print(
            f"[verify_parity] torch reference load mismatch — missing={real_missing[:5]} "
            f"unexpected={list(unexpected)[:5]}",
            file=sys.stderr,
        )
        return None
    from r3m_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD

    # the single source of the constants: the same ops.image values feed
    # the JAX side via cfg.norm_stats, so the two paths cannot drift
    x = torch.from_numpy(images) / 255.0
    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
    with torch.no_grad():
        return model((x - mean) / std).numpy()


def _torch_vit_forward(sd, images: np.ndarray) -> Optional[np.ndarray]:
    """ViT (size==0) reference forward: transformers ViTModel + 0.5/0.5
    normalization (the reference's ViT branch, models_r3m.py:52-61)."""
    import torch

    try:
        from transformers import ViTConfig as HFConfig, ViTModel
    except ImportError:
        return None
    from r3m_tpu.models.vit import vit_config_from_state

    cfg = vit_config_from_state(sd)
    model = ViTModel(
        HFConfig(
            hidden_size=cfg.dim,
            num_hidden_layers=cfg.n_layers,
            num_attention_heads=cfg.n_heads,
            intermediate_size=cfg.hidden_dim,
            image_size=cfg.image_size,
            patch_size=cfg.patch_size,
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        ),
        add_pooling_layer=True,
    ).eval()
    try:
        model.load_state_dict({k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()})
    except RuntimeError as e:
        print(f"[verify_parity] torch ViT reference load mismatch — {e}", file=sys.stderr)
        return None
    from r3m_tpu.ops.image import VIT_MEAN, VIT_STD

    x = torch.from_numpy(images) / 255.0
    mean = torch.tensor(VIT_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(VIT_STD).view(1, 3, 1, 1)
    with torch.no_grad():
        return model((x - mean) / std).pooler_output.numpy()


def _language_parity(sd, seed: int = 0, n: int = 4) -> Optional[Dict]:
    """Language-path parity: embedded DistilBERT + reward head, ours vs torch.

    Training/reproduce artifacts carry the full language stack
    (``module.lang_enc.model.*`` + ``module.lang_rew.pred.*`` —
    models_r3m.py:70-71); score the same (e0, es, token) triples through
    this package's converted chain and through a genuine torch forward
    (transformers DistilBertModel + the reference's 5-layer MLP). Returns
    None when the artifact has no language head or torch/transformers are
    unavailable.
    """
    try:
        import torch
        from transformers import DistilBertConfig as HFConfig, DistilBertModel

        from r3m_tpu.torch_oracle import TorchLanguageReward
    except ImportError:
        return None
    from r3m_tpu.convert import convert_language_stack
    from r3m_tpu.models.distilbert import sentence_embedding
    from r3m_tpu.models.language_reward import language_reward_apply

    bundle = convert_language_stack(sd)
    if bundle.get("lang_rew") is None or bundle.get("lang_enc") is None:
        return None
    import jax.numpy as jnp

    cfg = bundle["lang_enc"]["cfg"]
    rng = np.random.default_rng(seed)
    t = 12
    ids = rng.integers(0, cfg.vocab_size, size=(n, t)).astype(np.int64)
    lens = rng.integers(3, t + 1, size=(n,))
    mask = (np.arange(t)[None, :] < lens[:, None]).astype(np.int64)
    out_dim = int(bundle["lang_rew"]["layers"][0]["w"].shape[0] - cfg.dim) // 2
    e0 = rng.standard_normal((n, out_dim)).astype(np.float32)
    es = rng.standard_normal((n, out_dim)).astype(np.float32)

    le = sentence_embedding(
        bundle["lang_enc"]["params"], jnp.asarray(ids), jnp.asarray(mask), cfg
    )
    ours = np.asarray(
        language_reward_apply(
            bundle["lang_rew"], jnp.asarray(e0), jnp.asarray(es), le
        ),
        dtype=np.float64,
    )

    enc_prefix, rew_prefix = "lang_enc.model.", "lang_rew."
    hf = DistilBertModel(
        HFConfig(
            vocab_size=cfg.vocab_size, dim=cfg.dim, n_layers=cfg.n_layers,
            n_heads=cfg.n_heads, hidden_dim=cfg.hidden_dim,
            max_position_embeddings=cfg.max_position_embeddings,
        )
    ).eval()
    hidden = int(np.asarray(sd["lang_rew.pred.0.weight"]).shape[0])
    head = TorchLanguageReward(out_dim, hidden, cfg.dim).eval()
    try:
        hf.load_state_dict(
            {k[len(enc_prefix):]: v for k, v in sd.items() if k.startswith(enc_prefix)}
        )
        head.load_state_dict(
            {k[len(rew_prefix):]: v for k, v in sd.items() if k.startswith(rew_prefix)}
        )
    except RuntimeError as e:
        # e.g. a transformers-version key-set mismatch; degrade like the
        # vision side does rather than discarding the vision stats
        print(
            f"[verify_parity] torch language reference load mismatch — {e}",
            file=sys.stderr,
        )
        return None
    with torch.no_grad():
        t_le = hf(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.mean(1)
        ref = head(
            torch.from_numpy(e0), torch.from_numpy(es), t_le
        ).numpy().astype(np.float64)

    return {
        "lang_max_abs_diff": float(np.max(np.abs(ours - ref))),
        "lang_ok": bool(np.max(np.abs(ours - ref)) < 1e-3 * max(1.0, float(np.max(np.abs(ref))))),
    }


def verify_parity(
    modelpath: str,
    configpath: Optional[str] = None,
    n_images: int = 8,
    seed: int = 0,
    image_size: Optional[int] = None,
) -> Dict:
    """Run the parity check; returns the stats dict (also printed by main).

    Images are generated at the model's native input size (cfg.image_size,
    224 for the published checkpoints) so both paths apply the identical
    /255 + ImageNet-normalize preprocessing and nothing else. A non-native
    `image_size` would additionally route through this package's
    Resize(256)+CenterCrop law on one side only, so it is rejected in
    torch-reference mode.
    """
    from r3m_tpu import load_r3m_from_files

    enc = load_r3m_from_files(modelpath, configpath)
    if image_size is None:
        image_size = enc.cfg.image_size
    rng = np.random.default_rng(seed)
    images = rng.uniform(0, 255, size=(n_images, 3, image_size, image_size))
    images = images.astype(np.float32)

    ours = np.asarray(enc(images), dtype=np.float64)
    result: Dict = {
        "model": modelpath,
        "size": enc.cfg.size,
        "out_dim": int(ours.shape[-1]),
        "images": n_images,
        "bar": COSINE_BAR,
    }

    if image_size != enc.cfg.image_size:
        result.update(
            {
                "mode": "convert-only",
                "ok": bool(np.all(np.isfinite(ours))),
                "note": f"image_size {image_size} != native {enc.cfg.image_size}; "
                "preprocessing would differ between paths — finite-forward check only",
            }
        )
        return result

    ref_sd = _load_torch_reference_state(modelpath)
    ref = None if ref_sd is None else _torch_forward(ref_sd, images)
    if ref is None:
        result.update(
            {
                "mode": "convert-only",
                "ok": bool(np.all(np.isfinite(ours))),
                "note": "no torch reference for this artifact (torch absent, "
                "load mismatch, or a native snapshot); checked conversion + "
                "finite forward only",
            }
        )
        # a vision-reference load mismatch must not silence a language-stack
        # regression — the language reference may still load fine
        lang = None if ref_sd is None else _language_parity(ref_sd, seed=seed)
        if lang is not None:
            result.update(lang)
            result["ok"] = bool(result["ok"] and lang["lang_ok"])
        return result

    ref = ref.astype(np.float64)
    cos = np.sum(ours * ref, -1) / (
        np.linalg.norm(ours, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    result.update(
        {
            "mode": "torch-reference",
            "cosine_min": float(np.min(cos)),
            "cosine_mean": float(np.mean(cos)),
            "max_abs_diff": float(np.max(np.abs(ours - ref))),
            "ok": bool(np.min(cos) >= COSINE_BAR),
        }
    )
    lang = _language_parity(ref_sd, seed=seed)
    if lang is not None:
        result.update(lang)
        result["ok"] = bool(result["ok"] and lang["lang_ok"])
    return result


def main(argv=None) -> int:
    from r3m_tpu.utils.misc import honor_jax_platforms_env

    honor_jax_platforms_env()
    p = argparse.ArgumentParser(
        prog="python -m r3m_tpu.verify_parity", description=__doc__
    )
    p.add_argument("modelpath", help="path to a torch model.pt artifact")
    p.add_argument("configpath", nargs="?", default=None)
    p.add_argument("--images", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--image-size",
        type=int,
        default=None,
        help="input size for the generated probe images (default: the "
        "model's native cfg.image_size; other sizes run convert-only)",
    )
    a = p.parse_args(argv)
    result = verify_parity(
        a.modelpath, a.configpath, a.images, a.seed, a.image_size
    )
    print(json.dumps(result))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
