"""`python -m r3m_tpu.verify_parity` — mechanical checkpoint-parity CLI.

Runs the CLI's core function against the synthetic reference-layout torch
artifacts (the same fixture the converter tests use), checking that the
north-star cosine stats are produced and meet the BASELINE.json bar — so
the moment an environment has the real Google-Drive ``model.pt``, the
parity number is one command away (VERDICT round-1 item 5).
"""

import json
import os

import numpy as np
import pytest
import torch
import yaml

from r3m_tpu.verify_parity import COSINE_BAR, main, verify_parity

from .torch_ref import torch_resnet


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    d = tmp_path_factory.mktemp("vp_ckpt")
    tm = torch_resnet(18).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
    sd = {f"module.convnet.{k}": v for k, v in tm.state_dict().items()}
    sd["module.lang_rew.pred.0.weight"] = torch.zeros(8, 8)
    modelpath = str(d / "model.pt")
    torch.save({"r3m": sd}, modelpath)
    configpath = str(d / "config.yaml")
    with open(configpath, "w") as f:
        yaml.safe_dump({"lr": 1e-4, "agent": {"lr": "${lr}", "size": 18}}, f)
    return modelpath, configpath


def test_verify_parity_passes_on_roundtrip(artifacts):
    modelpath, configpath = artifacts
    result = verify_parity(modelpath, configpath, n_images=4)
    assert result["mode"] == "torch-reference"
    assert result["size"] == 18
    assert result["cosine_min"] >= COSINE_BAR
    assert result["ok"] is True


def test_verify_parity_cli_exit_codes(artifacts, capsys):
    modelpath, configpath = artifacts
    rc = main([modelpath, configpath, "--images", "2"])
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and out["ok"] is True


def test_verify_parity_non_native_size_is_convert_only(artifacts):
    """A probe size != cfg.image_size would route through the package's
    Resize(256)+CenterCrop on one side only; the CLI must refuse to call
    that 'parity' and fall back to the finite-forward check."""
    modelpath, configpath = artifacts
    result = verify_parity(modelpath, configpath, n_images=2, image_size=64)
    assert result["mode"] == "convert-only"
    assert result["ok"] is True


def test_verify_parity_detects_weight_divergence(artifacts, tmp_path):
    """The measurement genuinely reflects the weights: perturbing one conv
    changes the embeddings, while each artifact still round-trips against
    its own torch reference (the comparison is converter-vs-torch, and both
    see the same perturbed weights)."""
    modelpath, configpath = artifacts
    payload = torch.load(modelpath, map_location="cpu")
    bad = dict(payload["r3m"])
    k = "module.convnet.layer1.0.conv1.weight"
    with torch.no_grad():
        bad[k] = bad[k] + torch.randn_like(bad[k]) * 0.5
    badpath = str(tmp_path / "model.pt")
    torch.save({"r3m": bad}, badpath)

    perturbed = verify_parity(badpath, configpath, n_images=2)
    assert perturbed["mode"] == "torch-reference"
    assert perturbed["cosine_min"] >= COSINE_BAR  # internal consistency holds

    # cross-check: embeddings of good vs bad artifacts genuinely differ
    from r3m_tpu import load_r3m_from_files

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, size=(2, 3, 224, 224)).astype(np.float32)
    e_good = np.asarray(load_r3m_from_files(modelpath, configpath)(images))
    e_bad = np.asarray(load_r3m_from_files(badpath, configpath)(images))
    assert np.max(np.abs(e_good - e_bad)) > 1e-2


def test_verify_parity_native_snapshot_degrades_to_convert_only(tmp_path):
    """A native .npz snapshot is a valid CLI input (the converter side
    serves it) but has no torch-reference weights: the CLI must report
    convert-only mode, not die inside the torch unpickler."""
    import jax

    from r3m_tpu.checkpoint import save_snapshot
    from r3m_tpu.models.r3m import R3MConfig, r3m_init

    cfg = R3MConfig(size=18, langweight=0.0)
    state = r3m_init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "snapshot.npz")
    save_snapshot(
        path,
        {"params": state["params"], "batch_stats": state["batch_stats"]},
        meta={"config": {"size": 18}},
    )

    result = verify_parity(path, None, n_images=2)
    assert result["mode"] == "convert-only", result
    assert result["ok"] is True


def test_verify_parity_language_path(tmp_path):
    """Artifacts carrying the full language stack (lang_enc.model.* +
    lang_rew.pred.*) get the language-parity section: our converted
    DistilBERT+reward chain vs a genuine transformers/torch forward."""
    from transformers import DistilBertConfig as HFConfig, DistilBertModel

    from .torch_ref import TorchLanguageReward

    tm = torch_resnet(18).eval()
    hf = DistilBertModel(
        HFConfig(
            vocab_size=30, dim=768, n_layers=1, n_heads=12, hidden_dim=48,
            max_position_embeddings=32,
        )
    ).eval()
    head = TorchLanguageReward(512, 16, 768).eval()
    sd = {f"module.convnet.{k}": v for k, v in tm.state_dict().items()}
    sd.update({f"module.lang_enc.model.{k}": v for k, v in hf.state_dict().items()})
    sd.update({f"module.lang_rew.{k}": v for k, v in head.state_dict().items()})
    modelpath = str(tmp_path / "model.pt")
    torch.save({"r3m": sd}, modelpath)

    result = verify_parity(modelpath, None, n_images=2)
    assert result["mode"] == "torch-reference"
    assert "lang_max_abs_diff" in result, result
    assert result["lang_ok"] is True
    assert result["ok"] is True


def test_verify_parity_vit_artifact(tmp_path):
    """size==0 artifacts run the full torch-reference comparison (HF
    ViTModel + 0.5/0.5 normalize) instead of falling back to convert-only."""
    from types import SimpleNamespace

    import jax

    from r3m_tpu.checkpoint import export_torch_snapshot
    from r3m_tpu.models.r3m import R3MConfig, r3m_init

    cfg = R3MConfig(size=0, langweight=0.0, image_size=64)
    state = r3m_init(jax.random.PRNGKey(1), cfg)
    modelpath = str(tmp_path / "model.pt")
    export_torch_snapshot(
        modelpath,
        SimpleNamespace(
            params=state["params"], batch_stats=state["batch_stats"], step=np.int32(0)
        ),
        size=0,
    )

    result = verify_parity(modelpath, None, n_images=2)
    assert result["mode"] == "torch-reference", result
    assert result["size"] == 0 and result["out_dim"] == 768
    assert result["cosine_min"] >= COSINE_BAR, result
    assert result["ok"] is True


def test_verify_parity_language_reported_despite_vision_fallback(
    tmp_path, monkeypatch
):
    """A vision-reference load failure must not silence the language-parity
    section — the language reference can still load (ADVICE round 2)."""
    from transformers import DistilBertConfig as HFConfig, DistilBertModel

    import r3m_tpu.verify_parity as vp

    from .torch_ref import TorchLanguageReward

    tm = torch_resnet(18).eval()
    hf = DistilBertModel(
        HFConfig(
            vocab_size=30, dim=768, n_layers=1, n_heads=12, hidden_dim=48,
            max_position_embeddings=32,
        )
    ).eval()
    head = TorchLanguageReward(512, 16, 768).eval()
    sd = {f"module.convnet.{k}": v for k, v in tm.state_dict().items()}
    sd.update({f"module.lang_enc.model.{k}": v for k, v in hf.state_dict().items()})
    sd.update({f"module.lang_rew.{k}": v for k, v in head.state_dict().items()})
    modelpath = str(tmp_path / "model.pt")
    torch.save({"r3m": sd}, modelpath)

    monkeypatch.setattr(vp, "_torch_forward", lambda *a, **kw: None)
    result = vp.verify_parity(modelpath, None, n_images=2)
    assert result["mode"] == "convert-only"
    assert "lang_max_abs_diff" in result, result
    assert result["lang_ok"] is True


def test_run_parity_sweep_on_cached_artifacts(artifacts, tmp_path, monkeypatch):
    """scripts/run_parity.py: one pre-copied registry entry runs the full
    torch-reference comparison; unreachable entries are recorded as skipped
    (zero-egress behavior) and don't fail the sweep."""
    import shutil
    import sys

    scripts_dir = os.path.join(os.path.dirname(__file__), "..", "scripts")
    sys.path.insert(0, scripts_dir)
    try:
        import run_parity
    finally:
        sys.path.remove(scripts_dir)

    modelpath, configpath = artifacts
    home = tmp_path / "r3m_home"
    (home / "r3m_18").mkdir(parents=True)
    shutil.copy(modelpath, home / "r3m_18" / "model.pt")
    shutil.copy(configpath, home / "r3m_18" / "config.yaml")
    monkeypatch.setenv("R3M_HOME", str(home))
    # no egress in tests: any fetch attempt for the other entries must fail
    # fast instead of hitting the network
    import r3m_tpu.fetch as fetch

    monkeypatch.setattr(
        fetch, "_drive_download",
        lambda *a, **kw: (_ for _ in ()).throw(RuntimeError("no egress")),
    )

    out = tmp_path / "PARITY.json"
    rc = run_parity.main(["--out", str(out), "--images", "2"])
    summary = json.loads(out.read_text())
    assert rc == 0, summary
    assert summary["attempted"] == 7 and summary["ran"] == 1
    r18 = summary["results"]["resnet18"]
    assert r18["mode"] == "torch-reference" and r18["ok"] is True
    assert summary["results"]["resnet50"]["skipped"] is True
    assert summary["ok"] is True


def test_run_parity_empty_sweep_exits_nonzero(tmp_path, monkeypatch):
    """A sweep where every fetch fails (empty cache, zero egress) must NOT
    exit 0 — a CI gate wired to the script would read green as 'verified'."""
    import sys

    scripts_dir = os.path.join(os.path.dirname(__file__), "..", "scripts")
    sys.path.insert(0, scripts_dir)
    try:
        import run_parity
    finally:
        sys.path.remove(scripts_dir)

    monkeypatch.setenv("R3M_HOME", str(tmp_path / "empty_home"))
    import r3m_tpu.fetch as fetch

    monkeypatch.setattr(
        fetch, "_drive_download",
        lambda *a, **kw: (_ for _ in ()).throw(RuntimeError("no egress")),
    )
    out = tmp_path / "PARITY.json"
    rc = run_parity.main(["--out", str(out), "--images", "2"])
    summary = json.loads(out.read_text())
    assert summary["ran"] == 0 and summary["ok"] is False
    assert rc == 1
