"""Workspace/CLI integration: config loading, short training run, resume."""

import os

import numpy as np
import pytest

from r3m_tpu.data.ego4d import write_synthetic_dataset
from r3m_tpu.utils.config import load_config


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws_data")
    return write_synthetic_dataset(
        str(root), n_videos=4, min_len=10, max_len=16, size=64,
        captions=["C opens the door", "C picks up a cup"],
    )


def _base_cfg(dataset_root, tmp_path):
    return load_config(
        os.path.join(os.path.dirname(__file__), "..", "cfgs", "config_rep.yaml"),
        overrides=[
            f"datapath={dataset_root}",
            f"log_dir={tmp_path}",
            "batch_size=4",
            "train_steps=3",
            "eval_freq=2",
            "num_workers=2",
            "agent.size=18",
            "agent.langweight=0.0",
            "compute_dtype=float32",
            "n_devices=1",
        ],
    )


def test_config_interpolation_and_overrides(dataset_root, tmp_path):
    cfg = _base_cfg(dataset_root, tmp_path)
    assert cfg.agent["lr"] == cfg["lr"]  # ${lr} interpolation
    assert cfg.agent["bs"] == 4  # ${batch_size} + override
    assert cfg.agent["size"] == 18
    assert cfg["train_steps"] == 3


def test_workspace_train_eval_snapshot_resume(dataset_root, tmp_path):
    from r3m_tpu.training.workspace import Workspace

    work = tmp_path / "run1"
    work.mkdir()
    cfg = _base_cfg(dataset_root, tmp_path)
    ws = Workspace(cfg, work_dir=str(work))
    try:
        ws.train()
        assert ws.global_step == 3
    finally:
        ws.close()
    assert os.path.exists(work / "snapshot.npz")
    assert os.path.exists(tmp_path / "train.csv")

    # auto-resume picks up global step (last snapshot was post-update step 3)
    ws2 = Workspace(cfg, work_dir=str(work))
    try:
        assert ws2.global_step == 3
        ws2.train()  # already at train_steps => no-op
        assert ws2.global_step == 3
    finally:
        ws2.close()


def test_workspace_multichip_mesh(dataset_root, tmp_path):
    """End-to-end training over the full 8-device dp mesh (and 2 slices)."""
    from r3m_tpu.training.workspace import Workspace

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "cfgs", "config_rep.yaml"),
        overrides=[
            f"datapath={dataset_root}",
            f"log_dir={tmp_path}",
            "batch_size=8",
            "train_steps=2",
            "eval_freq=1000",
            "num_workers=2",
            "agent.size=18",
            "agent.langweight=0.0",
            "compute_dtype=float32",
            "n_devices=8",
            "n_slices=2",
            "snapshot=false",
        ],
    )
    ws = Workspace(cfg, work_dir=str(tmp_path))
    try:
        assert ws.mesh is not None and ws.mesh.devices.shape == (2, 4)
        ws.train()
        assert ws.global_step == 2
    finally:
        ws.close()
