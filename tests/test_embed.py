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
