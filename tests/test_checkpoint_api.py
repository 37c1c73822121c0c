"""Checkpoint round-trips + public load_r3m API parity on torch artifacts."""

import os

import numpy as np
import pytest
import torch
import yaml

import jax
import jax.numpy as jnp

from r3m_tpu import load_r3m_from_files
from r3m_tpu.checkpoint import (
    load_snapshot,
    load_torch_checkpoint,
    load_train_snapshot,
    save_snapshot,
    save_train_snapshot,
)
from r3m_tpu.models.r3m import R3MConfig
from r3m_tpu.training.trainer import create_train_state, make_train_step
from tests.torch_ref import torch_resnet


def test_snapshot_roundtrip(tmp_path):
    tree = {
        "a": np.arange(6, dtype=np.float32).reshape(2, 3),
        "nested": {"b": np.ones((4,), np.int32), "lst": [np.zeros(2), np.ones(3)]},
        "none": None,
    }
    p = str(tmp_path / "snap.npz")
    save_snapshot(p, tree, meta={"global_step": 42})
    loaded, meta = load_snapshot(p)
    assert meta["global_step"] == 42
    np.testing.assert_array_equal(loaded["a"], tree["a"])
    np.testing.assert_array_equal(loaded["nested"]["lst"][1], np.ones(3))
    assert isinstance(loaded["nested"]["lst"], list)
    assert loaded["none"] is None  # None round-trips


@pytest.mark.slow
def test_train_state_snapshot_resume(tmp_path):
    cfg = R3MConfig(size=18, tcnweight=1.0, langweight=0.0, image_size=32)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, donate=False)
    rng = np.random.default_rng(0)
    batch = {"images": rng.uniform(0, 255, (4, 5, 32, 32, 3)).astype(np.float32)}
    state, _ = step(state, batch)

    rolling = save_train_snapshot(str(tmp_path), state, cfg)
    assert os.path.exists(rolling)
    assert os.path.exists(str(tmp_path / "snapshot_1.npz"))

    fresh = create_train_state(cfg, jax.random.PRNGKey(99))
    restored = load_train_snapshot(rolling, fresh)
    assert int(restored.step) == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed state must continue training identically
    s1, m1 = step(restored, batch)
    s2, m2 = step(state, batch)
    np.testing.assert_allclose(
        float(m1["full_loss"]), float(m2["full_loss"]), rtol=1e-6
    )


def test_snapshot_on_disk_is_canonical_and_cross_layout(tmp_path):
    """Snapshots written from a packed-BN state must be canonical on disk
    (torchvision-named BN leaves, no runtime layout) and must load into
    either runtime layout; a canonical-era snapshot must load into a packed
    state (forward-compat for old checkpoints)."""
    from r3m_tpu.models.resnet import is_packed

    cfg_packed = R3MConfig(size=18, tcnweight=1.0, langweight=0.0, image_size=32)
    cfg_canon = R3MConfig(
        size=18, tcnweight=1.0, langweight=0.0, image_size=32, packed_bn=False
    )
    state_p = create_train_state(cfg_packed, jax.random.PRNGKey(0))
    state_c = create_train_state(cfg_canon, jax.random.PRNGKey(0))
    assert is_packed(state_p.params["convnet"])
    assert not is_packed(state_c.params["convnet"])

    snap = save_train_snapshot(
        str(tmp_path), state_p, cfg_packed, keep_step_copy=False
    )
    raw, _ = load_snapshot(snap)
    assert "bn_packed" not in raw["params"]["convnet"]
    assert "bn1" in raw["params"]["convnet"]  # canonical naming
    assert "bn1" in raw["batch_stats"]

    # packed snapshot -> canonical runtime, and back into packed runtime
    restored_c = load_train_snapshot(snap, state_c)
    restored_p = load_train_snapshot(snap, state_p)
    assert not is_packed(restored_c.params["convnet"])
    assert is_packed(restored_p.params["convnet"])
    np.testing.assert_array_equal(
        np.asarray(restored_p.params["convnet"]["bn_packed"]["scale"]),
        np.asarray(state_p.params["convnet"]["bn_packed"]["scale"]),
    )

    # canonical-era snapshot (written from an unpacked state) -> packed runtime
    (tmp_path / "canon").mkdir()
    snap_c = save_train_snapshot(
        str(tmp_path / "canon"), state_c, cfg_canon, keep_step_copy=False
    )
    restored_pc = load_train_snapshot(snap_c, state_p)
    assert is_packed(restored_pc.params["convnet"])
    for a, b in zip(
        jax.tree_util.tree_leaves(restored_pc.params),
        jax.tree_util.tree_leaves(state_p.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.fixture(scope="module")
def fake_reference_artifacts(tmp_path_factory):
    """A reference-layout snapshot: torch resnet18 under module.convnet.*"""
    d = tmp_path_factory.mktemp("ref_ckpt")
    tm = torch_resnet(18).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
    sd = {f"module.convnet.{k}": v for k, v in tm.state_dict().items()}
    # plus language-head entries that must be stripped on load
    sd["module.lang_enc.model.embeddings.word_embeddings.weight"] = torch.zeros(5, 4)
    sd["module.lang_rew.pred.0.weight"] = torch.zeros(8, 8)
    modelpath = str(d / "model.pt")
    torch.save({"r3m": sd}, modelpath)
    configpath = str(d / "config.yaml")
    with open(configpath, "w") as f:
        yaml.safe_dump(
            {
                "agent": {
                    "_target_": "r3m.R3M",
                    "device": "cuda",
                    "lr": 1e-4,
                    "hidden_dim": 1024,
                    "size": 18,
                    "l2weight": 1e-5,
                    "l1weight": 1e-5,
                    "langweight": 1.0,
                    "tcnweight": 1.0,
                    "l2dist": True,
                    "bs": 16,
                    "not_a_valid_arg": 123,
                }
            },
            f,
        )
    return tm, modelpath, configpath


def test_load_torch_checkpoint_strips_language(fake_reference_artifacts):
    _, modelpath, _ = fake_reference_artifacts
    bundle = load_torch_checkpoint(modelpath)
    assert bundle["size"] == 18
    assert bundle["lang_rew"] is None
    assert bundle["convnet"]["params"]["conv1"]["w"].shape == (7, 7, 3, 64)


def test_load_r3m_embedding_parity(fake_reference_artifacts, rng):
    """BASELINE config 1: load_r3m forward matches reference embeddings."""
    tm, modelpath, configpath = fake_reference_artifacts
    model = load_r3m_from_files(modelpath, configpath)
    assert model.cfg.langweight == 0  # cleanup_config forces it
    assert model.outdim == 512

    obs = rng.uniform(0, 255, size=(2, 3, 224, 224)).astype(np.float32)
    emb = np.asarray(model(obs))

    # reference forward: /255, ImageNet normalize, resnet
    x = torch.from_numpy(obs) / 255.0
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with torch.no_grad():
        ref = tm((x - mean) / std).numpy()

    cos = np.sum(emb * ref, -1) / (
        np.linalg.norm(emb, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert np.all(cos >= 0.999), cos  # the BASELINE.json parity bar
    np.testing.assert_allclose(emb, ref, rtol=1e-3, atol=1e-3)


def test_import_torch_snapshot_to_state(fake_reference_artifacts):
    """Continue a reference-trained run on TPU: weights + step imported."""
    import jax

    from r3m_tpu.checkpoint import import_torch_snapshot_to_state
    from r3m_tpu.models.r3m import R3MConfig
    from r3m_tpu.training.trainer import create_train_state

    tm, modelpath, _ = fake_reference_artifacts
    # reference training snapshots carry global_step (train_repr...py:129)
    import torch

    sd = {f"module.convnet.{k}": v for k, v in tm.state_dict().items()}
    snap = modelpath.replace("model.pt", "snapshot.pt")
    torch.save({"r3m": sd, "global_step": 1234}, snap)

    cfg = R3MConfig(size=18, langweight=0.0)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state2 = import_torch_snapshot_to_state(snap, state)
    assert int(state2.step) == 1234
    got = np.asarray(state2.params["convnet"]["conv1"]["w"])
    want = tm.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # runtime batch_stats use the packed-BN layout; compare canonically
    from r3m_tpu.models.resnet import unpack_bn_state

    stats = unpack_bn_state(state2.batch_stats, 18)
    bn_mean = np.asarray(stats["bn1"]["mean"])
    np.testing.assert_allclose(
        bn_mean, tm.state_dict()["bn1.running_mean"].numpy(), rtol=1e-6
    )


def test_load_r3m_uses_cache_layout(fake_reference_artifacts, tmp_path, monkeypatch):
    """load_r3m resolves artifacts from the ~/.r3m cache without network."""
    import shutil

    from r3m_tpu import load_r3m

    _, modelpath, configpath = fake_reference_artifacts
    home = tmp_path / "r3m_home"
    (home / "r3m_18").mkdir(parents=True)
    shutil.copy(modelpath, home / "r3m_18" / "model.pt")
    shutil.copy(configpath, home / "r3m_18" / "config.yaml")
    monkeypatch.setenv("R3M_HOME", str(home))
    model = load_r3m("resnet18")
    assert model.outdim == 512

    with pytest.raises(NameError, match="Invalid Model ID"):
        load_r3m("resnet99")


@pytest.mark.slow
def test_load_r3m_from_native_snapshot(tmp_path):
    """Embedding inference from our own training snapshots (.npz)."""
    import jax

    from r3m_tpu import load_r3m_from_files
    from r3m_tpu.checkpoint import save_train_snapshot
    from r3m_tpu.models.r3m import R3MConfig
    from r3m_tpu.training.trainer import create_train_state

    cfg = R3MConfig(size=18, langweight=1.0)  # lang head present in snapshot
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    snap = save_train_snapshot(str(tmp_path), state, cfg, keep_step_copy=False)

    model = load_r3m_from_files(snap)
    assert model.cfg.langweight == 0  # dropped for downstream use
    emb = model(np.zeros((1, 3, 64, 64), np.float32) + 50)
    assert emb.shape == (1, 512)


@pytest.mark.slow
def test_vit_train_state_snapshot_roundtrip(tmp_path):
    """Empty batch_stats ({} for ViT) must survive save/load (regression:
    _flatten silently dropped empty containers)."""
    import jax

    from r3m_tpu.checkpoint import load_train_snapshot, save_train_snapshot
    from r3m_tpu.models.r3m import R3MConfig
    from r3m_tpu.training.trainer import create_train_state

    cfg = R3MConfig(size=0)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    assert state.batch_stats == {}
    snap = save_train_snapshot(str(tmp_path), state, cfg, keep_step_copy=False)
    restored = load_train_snapshot(snap, state)
    assert restored.batch_stats == {}


def test_import_torch_snapshot_with_language_head(tmp_path):
    """Language-trained reference snapshots import lang_rew too."""
    import jax
    import torch

    from r3m_tpu.checkpoint import import_torch_snapshot_to_state
    from r3m_tpu.models.r3m import R3MConfig
    from r3m_tpu.training.trainer import create_train_state
    from tests.torch_ref import TorchLanguageReward, torch_resnet

    tm = torch_resnet(18)
    lr_torch = TorchLanguageReward(512, 1024, 768)
    sd = {f"module.convnet.{k}": v for k, v in tm.state_dict().items()}
    sd.update({f"module.lang_rew.{k}": v for k, v in lr_torch.state_dict().items()})
    snap = str(tmp_path / "snapshot.pt")
    torch.save({"r3m": sd, "global_step": 7}, snap)

    cfg = R3MConfig(size=18, langweight=1.0)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state2 = import_torch_snapshot_to_state(snap, state)
    assert int(state2.step) == 7
    # structure-agnostic check: some lang_rew leaf matches the torch
    # first-layer weight after transpose
    w0 = lr_torch.state_dict()["pred.0.weight"].numpy().T
    leaves = jax.tree_util.tree_leaves(state2.params["lang_rew"])
    assert any(
        l.shape == w0.shape and np.allclose(np.asarray(l), w0, rtol=1e-6)
        for l in leaves
    )


def test_load_r3m_reproduce_cache_layout(fake_reference_artifacts, tmp_path, monkeypatch):
    """load_r3m_reproduce resolves its own registry folders (typo-fixed ids)."""
    import shutil

    from r3m_tpu import load_r3m_reproduce

    _, modelpath, configpath = fake_reference_artifacts
    home = tmp_path / "r3m_home"
    for folder in ("original_r3m", "original_r3m_nol1"):
        (home / folder).mkdir(parents=True)
        shutil.copy(modelpath, home / folder / "model.pt")
        shutil.copy(configpath, home / folder / "config.yaml")
    monkeypatch.setenv("R3M_HOME", str(home))
    assert load_r3m_reproduce("r3m").outdim == 512
    # unreachable in the reference due to the `modelif` typo — loadable here
    assert load_r3m_reproduce("r3m_nol1").outdim == 512


def test_export_torch_snapshot_reference_roundtrip(tmp_path):
    """TPU-trained weights -> reference-format torch snapshot: strict-loads
    into a reference-shaped torch model with matching forward outputs, and
    re-imports into a fresh TrainState bit-exactly."""
    from r3m_tpu.checkpoint import (
        export_torch_snapshot,
        import_torch_snapshot_to_state,
    )
    from r3m_tpu.models.resnet import resnet_apply

    cfg = R3MConfig(size=18, langweight=1.0)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = state._replace(step=jnp.asarray(123, jnp.int32))
    path = str(tmp_path / "snapshot.pt")
    export_torch_snapshot(path, state, size=18)

    payload = torch.load(path, map_location="cpu", weights_only=True)
    assert payload["global_step"] == 123
    sd = payload["r3m"]
    assert any(k.startswith("module.lang_rew.") for k in sd)

    # reference compatibility: strict load into the torch resnet (fc=Identity)
    tm = torch_resnet(18)
    conv_sd = {
        k[len("module.convnet."):]: v
        for k, v in sd.items()
        if k.startswith("module.convnet.")
    }
    tm.load_state_dict(conv_sd, strict=True)
    tm.eval()
    x = np.random.default_rng(0).normal(size=(2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    out, _ = resnet_apply(
        state.params["convnet"], state.batch_stats,
        jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), size=18, train=False,
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)

    # round-trip back into a fresh TPU train state
    fresh = create_train_state(cfg, jax.random.PRNGKey(1))
    restored = import_torch_snapshot_to_state(path, fresh)
    assert int(restored.step) == 123
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        restored.params, state.params,
    )


def test_async_snapshot_writer_overlaps_and_surfaces_errors(tmp_path):
    """AsyncSnapshotWriter: writes land, one in flight, failures raise."""
    import threading
    import time as _time

    from r3m_tpu.checkpoint import AsyncSnapshotWriter

    w = AsyncSnapshotWriter()
    done = threading.Event()

    def slow_write():
        _time.sleep(0.1)
        (tmp_path / "a.txt").write_text("ok")
        done.set()

    w.submit(slow_write)
    assert not done.is_set()  # returned before the write finished
    w.wait()
    assert (tmp_path / "a.txt").read_text() == "ok"

    def bad_write():
        raise OSError("disk full")

    w.submit(bad_write)
    with pytest.raises(RuntimeError, match="async snapshot"):
        w.wait()
    # the error is consumed: the writer is reusable afterwards
    w.submit(lambda: (tmp_path / "b.txt").write_text("ok"))
    w.wait()
    assert (tmp_path / "b.txt").exists()


def test_fetch_rejects_html_interstitial(tmp_path):
    """A Drive HTML page must never be committed to the artifact cache."""
    from r3m_tpu.fetch import _validate_payload

    bad = tmp_path / "model.pt.part"
    bad.write_bytes(b"<!DOCTYPE html><html>Google Drive can't scan...")
    with pytest.raises(RuntimeError, match="non-artifact payload"):
        _validate_payload(str(bad), str(tmp_path / "model.pt"))
    assert not bad.exists()  # .part removed, nothing committed

    good = tmp_path / "ok.pt.part"
    good.write_bytes(b"PK\x03\x04rest-of-zip")
    _validate_payload(str(good), str(tmp_path / "ok.pt"))  # no raise

    pickle_style = tmp_path / "old.pt.part"
    pickle_style.write_bytes(b"\x80\x02payload")
    _validate_payload(str(pickle_style), str(tmp_path / "old.pt"))

    cfg_bad = tmp_path / "config.yaml.part"
    cfg_bad.write_bytes(b"  <html>quota exceeded</html>")
    with pytest.raises(RuntimeError, match="non-artifact payload"):
        _validate_payload(str(cfg_bad), str(tmp_path / "config.yaml"))


@pytest.mark.slow
def test_convert_cli_roundtrip(tmp_path):
    """to-torch -> to-native round-trips weights bit-close through the CLI."""
    from r3m_tpu.checkpoint import load_snapshot, save_train_snapshot
    from r3m_tpu.convert import main as convert_main
    from r3m_tpu.models.r3m import R3MConfig
    from r3m_tpu.training.trainer import create_train_state

    cfg = R3MConfig(size=18, langweight=1.0, image_size=32)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    snap = save_train_snapshot(str(tmp_path), state, cfg, keep_step_copy=False)
    pt = str(tmp_path / "rt.pt")
    back = str(tmp_path / "back.npz")
    assert convert_main(["to-torch", snap, pt]) == 0
    assert convert_main(["to-native", pt, back]) == 0
    tree, meta = load_snapshot(back)
    assert meta["config"]["size"] == 18
    np.testing.assert_allclose(
        np.asarray(state.params["convnet"]["conv1"]["w"]),
        np.asarray(tree["params"]["convnet"]["conv1"]["w"]),
        atol=1e-6,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params["lang_rew"]),
        jax.tree_util.tree_leaves(tree["params"]["lang_rew"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # the to-native output must honor the on-disk canonical-BN contract even
    # though the template train state uses the packed runtime layout — a
    # packed save would crash BN folding in the serving loader below
    from r3m_tpu import load_r3m_from_snapshot
    from r3m_tpu.models.resnet import is_packed

    assert not is_packed(tree["params"]["convnet"])
    assert "bn1" in tree["batch_stats"]
    enc = load_r3m_from_snapshot(back)
    out = enc(np.zeros((1, 3, 32, 32), np.uint8))
    assert out.shape == (1, 512)


def test_load_with_verbatim_reference_config(fake_reference_artifacts, tmp_path):
    """Real checkpoint folders ship the TRAINING config with OmegaConf
    interpolations (`lr: ${lr}`, `bs: ${batch_size}`, `device: ${device}` —
    /root/reference/r3m/cfgs/config_rep.yaml:33,41). Loading must resolve
    them against the root (as the reference's OmegaConf.load does,
    r3m/__init__.py:69-70) so junk strings never reach R3MConfig."""
    _, modelpath, _ = fake_reference_artifacts
    # verbatim copy of /root/reference/r3m/cfgs/config_rep.yaml
    configpath = str(tmp_path / "config.yaml")
    with open(configpath, "w") as f:
        f.write(
            """defaults:
  - _self_
  - override hydra/launcher:  local
  - override hydra/output:  local


# snapshot
save_snapshot: false
load_snap: ""
# replay buffer
num_workers: 10
batch_size: 32 #256
train_steps: 2000000
eval_freq: 20000
# misc
seed: 1
device: cuda
# experiment
experiment: train_r3m
# agent
lr: 1e-4
# data
alpha: 0.2
dataset: "ego4d"
wandbproject: 
wandbuser: 
doaug: "none"
datapath: 

agent:
  _target_: r3m.R3M
  device: ${device}
  lr: ${lr}
  hidden_dim: 1024
  size: 34
  l2weight: 0.00001
  l1weight: 0.00001
  tcnweight: 1.0
  langweight: 0.0
  l2dist: true
  bs: ${batch_size}
"""
        )
    model = load_r3m_from_files(modelpath, configpath)
    # interpolations resolved + typed: lr is the root's 1e-4 as a FLOAT
    # (pyyaml parses exponent-only literals as strings), bs the root's 32
    assert model.cfg.lr == pytest.approx(1e-4)
    assert isinstance(model.cfg.lr, float)
    assert model.cfg.bs == 32
    assert model.cfg.size == 18  # weights win over the config's size: 34
    assert model.cfg.langweight == 0
    # the config must be optimizer-ready (a literal '${lr}' string would
    # die in the schedule parser)
    from r3m_tpu.training.trainer import make_optimizer

    make_optimizer(model.cfg)

    obs = np.zeros((1, 3, 224, 224), np.float32)
    assert np.asarray(model(obs)).shape == (1, 512)


def test_load_with_unresolvable_interpolation_dropped(
    fake_reference_artifacts, tmp_path
):
    """Agent values referencing keys absent from the root (hydra-only
    sections) are dropped, falling back to R3MConfig defaults."""
    _, modelpath, _ = fake_reference_artifacts
    configpath = str(tmp_path / "config.yaml")
    with open(configpath, "w") as f:
        yaml.safe_dump(
            {"agent": {"lr": "${oc.env:LR}", "hidden_dim": 1024, "size": 18}}, f
        )
    model = load_r3m_from_files(modelpath, configpath)
    assert model.cfg.lr == 1e-4  # R3MConfig default, not the junk string


def test_config_from_meta_coerces_stale_levers():
    """Backbone-mismatched runtime levers in old snapshot metadata (from when
    they were silent no-ops, before __post_init__ validation) must coerce to
    their defaults with a warning — never refuse to load the checkpoint."""
    import warnings

    from r3m_tpu.checkpoint import r3m_config_from_meta

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = r3m_config_from_meta({"config": {"size": 0, "remat": "conv_saved"}})
    assert cfg.size == 0 and cfg.remat == "none"
    assert any("remat" in str(x.message) for x in w)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = r3m_config_from_meta({"config": {"size": 50, "vit_fused_attn": True}})
    assert cfg.size == 50 and cfg.vit_fused_attn is False
    assert any("vit_fused_attn" in str(x.message) for x in w)

    # valid combinations pass through untouched (incl. explicit overrides)
    assert r3m_config_from_meta(
        {"config": {"size": 34}}, remat="conv_saved"
    ).remat == "conv_saved"
    assert r3m_config_from_meta(
        {"config": {"size": 0, "vit_fused_attn": True}}
    ).vit_fused_attn is True


def test_snapshot_without_config_meta_raises(tmp_path):
    """A snapshot lacking 'config' metadata must fail loudly at load time —
    r3m_config_from_meta would otherwise silently default to resnet50 and
    die with a bare IndexError inside BN folding for any other backbone."""
    from r3m_tpu import load_r3m_from_snapshot
    from r3m_tpu.checkpoint import save_snapshot
    from r3m_tpu.models.r3m import r3m_init

    cfg = R3MConfig(size=18, langweight=0, image_size=32)
    state = r3m_init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "no_config.npz")
    save_snapshot(
        path,
        {"params": state["params"], "batch_stats": state["batch_stats"]},
        meta={"global_step": 0},
    )
    with pytest.raises(ValueError, match="no 'config' metadata"):
        load_r3m_from_snapshot(path)


def test_fold_batchnorm_rejects_backbone_mismatch():
    """fold_batchnorm names the size/params mismatch instead of IndexError."""
    from r3m_tpu.models.r3m import r3m_init
    from r3m_tpu.models.resnet import fold_batchnorm

    cfg = R3MConfig(size=18, langweight=0, image_size=32)
    state = r3m_init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="resnet50 expects"):
        fold_batchnorm(
            state["params"]["convnet"], state["batch_stats"], size=50
        )
