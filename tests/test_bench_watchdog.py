"""bench.py watchdog: an unresponsive backend aborts cleanly, never hangs.

The driver runs ``bench.py`` unattended at round end; when the tunneled TPU
link is dead the first device op blocks forever with no exception, so the
process arms a BENCH_WATCHDOG timer (bench.py `_arm_watchdog`). Asserts the
contract: a run that can't produce a result inside the window exits with
code 3 and a diagnosable message instead of hanging its caller.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_watchdog_aborts_stuck_run(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # A CPU resnet18 bench takes tens of seconds — a 3 s window guarantees
    # the watchdog wins the race, simulating a hung backend without one.
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        BENCH_SIZE="18",
        BENCH_BS="4",
        BENCH_STEPS="2",
        BENCH_DTYPE="float32",
        BENCH_WATCHDOG="3",
        BENCH_CACHE=str(tmp_path / "xla_cache"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, env=env, cwd=repo, timeout=120,
    )
    assert out.returncode == 3, (out.returncode, out.stderr[-2000:])
    assert "unresponsive" in out.stderr
    # the headline JSON line must NOT have been emitted by a killed run
    assert not any(ln.startswith("{") for ln in out.stdout.splitlines())


@pytest.mark.slow
def test_watchdog_disabled_by_zero(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        BENCH_SIZE="18",
        BENCH_BS="2",
        BENCH_STEPS="1",
        BENCH_DTYPE="float32",
        BENCH_WATCHDOG="0",
        BENCH_CACHE=str(tmp_path / "xla_cache"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, env=env, cwd=repo, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert any(ln.startswith("{") for ln in out.stdout.splitlines())
