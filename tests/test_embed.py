"""Batch embedding-extraction CLI (r3m_tpu/embed.py)."""

import glob

import numpy as np
import pytest

import jax

from r3m_tpu.checkpoint import save_train_snapshot
from r3m_tpu.data.ego4d import write_synthetic_dataset
from r3m_tpu.embed import collect_image_files, main
from r3m_tpu.models.r3m import R3MConfig
from r3m_tpu.training.trainer import create_train_state


@pytest.mark.slow
def test_embed_cli_writes_embeddings_npz(tmp_path):
    root = write_synthetic_dataset(
        str(tmp_path / "d"), n_videos=2, min_len=4, max_len=5, size=48
    )
    cfg = R3MConfig(size=18, langweight=0.0, image_size=32)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    snap = save_train_snapshot(str(tmp_path), state, cfg, keep_step_copy=False)

    out = main([
        root, "--snapshot", snap,
        "--out", str(tmp_path / "emb.npz"), "--batch", "4",
    ])
    z = np.load(out)
    n = len(glob.glob(f"{root}/**/*.jpg", recursive=True))
    assert n > 4  # exercises the padded tail batch
    assert z["embeddings"].shape == (n, 512)
    assert z["embeddings"].dtype == np.float32
    assert list(z["paths"]) == sorted(list(z["paths"]))  # deterministic order
    # batch padding must not leak into results: re-embed one file alone
    one = main([
        str(z["paths"][0]), "--snapshot", snap,
        "--out", str(tmp_path / "one.npz"), "--batch", "4",
    ])
    np.testing.assert_allclose(
        np.load(one)["embeddings"][0], z["embeddings"][0], atol=2e-5
    )


def test_collect_image_files_rejects_junk(tmp_path):
    (tmp_path / "x.txt").write_text("nope")
    with pytest.raises(ValueError, match="not an image"):
        collect_image_files([str(tmp_path / "x.txt")])
    with pytest.raises(ValueError, match="no image files"):
        collect_image_files([str(tmp_path)])


def test_collect_image_files_dedups_overlapping_inputs(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "a.jpg").write_bytes(b"x")
    (d / "b.jpg").write_bytes(b"x")
    files = collect_image_files([str(d), str(d / "a.jpg"), str(d)])
    assert files == sorted(files)
    assert len(files) == 2  # no duplicate rows


def test_cli_returns_zero(tmp_path, monkeypatch):
    """Console-script wrapper must sys.exit(0) on success."""
    import r3m_tpu.embed as embed_mod

    monkeypatch.setattr(embed_mod, "main", lambda argv=None: "/some/path.npz")
    assert embed_mod.cli([]) == 0


@pytest.mark.slow
def test_mesh_serving_matches_single_device(tmp_path):
    """mesh= on the encoder (and --n-devices on the CLI) runs the forward
    data-parallel over the 8-device mesh with identical results to
    single-device serving — the serving analogue of DataParallel
    (r3m/__init__.py:72)."""
    from r3m_tpu import load_r3m_from_snapshot
    from r3m_tpu.parallel.mesh import make_mesh

    cfg = R3MConfig(size=18, langweight=0.0, image_size=32)
    state = create_train_state(cfg, jax.random.PRNGKey(1))
    snap = save_train_snapshot(str(tmp_path), state, cfg, keep_step_copy=False)

    mesh = make_mesh(8)
    enc_mesh = load_r3m_from_snapshot(snap, mesh=mesh)
    enc_one = load_r3m_from_snapshot(snap)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(8, 3, 32, 32)).astype(np.float32)
    e_mesh = enc_mesh(imgs)
    np.testing.assert_allclose(
        np.asarray(e_mesh), np.asarray(enc_one(imgs)), rtol=1e-5, atol=1e-5
    )
    assert len(e_mesh.sharding.device_set) == 8  # actually ran data-parallel
    with pytest.raises(ValueError, match="divisible"):
        enc_mesh(imgs[:3])


@pytest.mark.slow
def test_embed_cli_n_devices(tmp_path):
    root = write_synthetic_dataset(
        str(tmp_path / "d"), n_videos=2, min_len=4, max_len=5, size=48
    )
    cfg = R3MConfig(size=18, langweight=0.0, image_size=32)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    snap = save_train_snapshot(str(tmp_path), state, cfg, keep_step_copy=False)

    out = main([
        root, "--snapshot", snap, "--out", str(tmp_path / "m.npz"),
        "--batch", "5", "--n-devices", "8",  # 5 rounds up to 8
    ])
    ref = main([
        root, "--snapshot", snap, "--out", str(tmp_path / "s.npz"), "--batch", "4",
    ])
    zm, zs = np.load(out), np.load(ref)
    np.testing.assert_allclose(zm["embeddings"], zs["embeddings"], rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_embed_cli_fast_precision(tmp_path):
    """--precision fast reaches the encoder; embeddings track parity."""
    root = write_synthetic_dataset(
        str(tmp_path / "d"), n_videos=1, min_len=4, max_len=4, size=48
    )
    cfg = R3MConfig(size=18, langweight=0.0, image_size=32)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    snap = save_train_snapshot(str(tmp_path), state, cfg, keep_step_copy=False)

    fast = np.load(main([
        root, "--snapshot", snap, "--precision", "fast",
        "--out", str(tmp_path / "fast.npz"), "--batch", "4",
    ]))["embeddings"]
    parity = np.load(main([
        root, "--snapshot", snap,
        "--out", str(tmp_path / "parity.npz"), "--batch", "4",
    ]))["embeddings"]
    assert fast.dtype == np.float32
    cos = np.sum(fast * parity, axis=-1) / np.maximum(
        np.linalg.norm(fast, axis=-1) * np.linalg.norm(parity, axis=-1), 1e-12
    )
    assert np.all(cos >= 0.995), cos
