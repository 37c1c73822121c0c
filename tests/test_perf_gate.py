"""Perf-regression gate (scripts/perf_gate.py): the committed baseline
constants must actually FAIL a run whose numbers drop (VERDICT round-4
item 3 — nothing guarded the measured numbers before)."""

import json
import os
import subprocess
import sys

GATE = os.path.join(os.path.dirname(__file__), "..", "scripts", "perf_gate.py")


def _run(log_text: str, scale=None, expect_all=False):
    env = dict(os.environ)
    env.pop("PERF_GATE_SCALE", None)
    if scale is not None:
        env["PERF_GATE_SCALE"] = str(scale)
    args = [sys.executable, GATE] + (["--expect-all"] if expect_all else [])
    return subprocess.run(
        args + ["-"],
        input=log_text,
        capture_output=True,
        text=True,
        env=env,
    )


def _line(metric, value, **tags):
    return json.dumps(
        {"metric": metric, "value": value, "unit": "frames/s", **tags}
    )


HEADLINE = "r3m_pretrain_resnet50_frames_per_sec_per_chip"
VIT = "r3m_pretrain_size0_frames_per_sec_per_chip"


def test_healthy_log_passes():
    log = "\n".join([
        "noise line",
        _line(HEADLINE, 2350.0),
        _line(VIT, 3640.0, vit_fused="auto"),
    ])
    r = _run(log)
    assert r.returncode == 0, r.stdout + r.stderr


def test_regressed_headline_fails():
    r = _run(_line(HEADLINE, 1900.0))  # below 2355 * 0.88 = 2072
    assert r.returncode == 1, r.stdout
    assert "FAIL" in r.stdout and "REGRESSION" in r.stdout


def test_injected_slowdown_env_knob_fails():
    """The documented injection test: a healthy log scaled by 0.5 fails."""
    r = _run(_line(HEADLINE, 2350.0), scale=0.5)
    assert r.returncode == 1, r.stdout
    assert "PERF_GATE_SCALE" in r.stdout


def test_empty_log_cannot_pass_vacuously():
    r = _run("nothing measured here\n")
    assert r.returncode == 2, r.stdout


def test_deliberate_comparison_runs_do_not_trip_gate():
    """The battery's einsum-comparison ViT runs are slower ON PURPOSE and
    carry a vit_fused tag != 'auto' — they must be ignored, while the
    tagged auto run gates normally. Best-of wins when a metric repeats."""
    log = "\n".join([
        _line(HEADLINE, 2350.0),
        _line(VIT, 3046.0, vit_fused="0"),      # einsum comparison: ignored
        _line(VIT, 3100.0, vit_fused="True"),   # unrolled comparison: ignored
        _line(VIT, 3640.0, vit_fused="auto"),   # the gated default
    ])
    r = _run(log)
    assert r.returncode == 0, r.stdout
    # and a slow AUTO run still fails even with fast comparison runs present
    log_bad = "\n".join([
        _line(HEADLINE, 2350.0),
        _line(VIT, 2800.0, vit_fused="auto"),
    ])
    r = _run(log_bad)
    assert r.returncode == 1, r.stdout


def test_partial_log_fails_under_expect_all():
    """A battery whose ViT stages all crashed leaves only the resnet
    headline in the log; --expect-all must refuse to pass on the subset
    (review finding: the battery has no set -e, so a stage can die without
    aborting the run)."""
    log = _line(HEADLINE, 2350.0)
    assert _run(log).returncode == 0  # ad-hoc single-metric use still ok
    r = _run(log, expect_all=True)
    assert r.returncode == 2, r.stdout
    assert VIT in r.stdout
    # a complete log passes with the flag
    full = "\n".join([
        _line(HEADLINE, 2350.0),
        _line(VIT, 3640.0, vit_fused="auto"),
    ])
    assert _run(full, expect_all=True).returncode == 0


def test_battery_wires_the_gate():
    """bench_battery.sh must end by gating its OWN run's records: a fresh
    per-run log (the named log appends across runs, and best-of-metric
    would let yesterday's healthy number mask today's regression) and
    --expect-all (a crashed stage must not pass by omission)."""
    battery = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "bench_battery.sh"
    )
    with open(battery) as f:
        text = f.read()
    assert 'perf_gate.py --expect-all "$RUNLOG"' in text
    assert "mktemp" in text
