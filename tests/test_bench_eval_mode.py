"""bench.py BENCH_EVAL mode: the serving-throughput path runs.

Exercises the `load_r3m` inference law end-to-end through the bench's own
entry point in a subprocess (the reference's primary downstream use,
``/root/reference/r3m/example.py:30-43``): BN-folded encoder, host uint8
NCHW -> preprocess -> embed.
"""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_bench_eval_mode_end_to_end(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        BENCH_EVAL="1",
        BENCH_SIZE="18",
        BENCH_BS="4",
        BENCH_STEPS="2",
        BENCH_CACHE=str(tmp_path / "xla_cache"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, env=env, cwd=repo, timeout=540,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "device-resident encoder forward" in out.stdout
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, out.stdout
    result = json.loads(lines[-1])
    assert result["metric"] == "r3m_serving_size18_delivered_frames_per_sec"
    assert result["value"] > 0
    assert result["unit"] == "frames/s"
