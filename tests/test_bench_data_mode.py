"""bench.py BENCH_DATA mode: the end-to-end delivered-frames/s path runs.

Drives the full input stack (Ego4D manifest sampling -> JPEG decode ->
tokenize -> producer queue -> device prefetch -> train step) through the
bench's own entry point in a subprocess, the way the driver invokes it —
the reference's README workflow bound (README.md:34, data_loaders.py:83-95).
"""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_bench_data_mode_end_to_end(tmp_path):
    from r3m_tpu.data.ego4d import write_synthetic_dataset

    root = str(tmp_path / "data")
    write_synthetic_dataset(root, n_videos=6, size=224)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        BENCH_DATA=root,
        BENCH_SIZE="18",
        BENCH_BS="4",
        BENCH_STEPS="2",
        BENCH_LANGW="0",
        BENCH_DTYPE="float32",
        BENCH_WORKERS="2",
        BENCH_CACHE=str(tmp_path / "xla_cache"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, env=env, cwd=repo, timeout=540,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, out.stdout
    result = json.loads(lines[-1])
    assert "e2e_delivered" in result["metric"]
    assert result["value"] > 0
    assert result["unit"] == "frames/s"
