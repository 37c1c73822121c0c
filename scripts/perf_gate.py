#!/usr/bin/env python
"""Perf-regression gate: fail when a measured headline drops below baseline.

Scans a bench/battery log (or stdin) for the one-line JSON records bench.py
prints (``{"metric": ..., "value": ..., ...}``) and compares every metric
that appears in ``scripts/perf_baseline.json`` against its committed
constant. Nothing asserted these numbers before (VERDICT round-4 weak #2):
an XLA upgrade, an accidental f32 default, or a donation regression would
have landed silently until a human re-read BASELINE.md.

Rules:
  * a gated metric FAILS when value < min_expected * (1 - tolerance);
  * records carrying tags that don't match the baseline entry's ``require``
    dict are ignored (e.g. the battery's deliberate einsum-comparison ViT
    runs are tagged ``vit_fused`` != "auto" and must not trip the gate);
  * when a gated metric appears several times, the BEST reading counts
    (sweeps include deliberately slower configurations);
  * zero gated metrics found => exit 2 (an empty log must not pass);
  * with ``--expect-all``, EVERY baseline metric must appear => exit 2
    otherwise (the battery's mode: a crashed ViT stage must not let the
    remaining metrics pass the gate on its behalf — review finding).

Exit codes: 0 ok, 1 regression, 2 no gated metrics found.

``PERF_GATE_SCALE`` multiplies every observed value before comparison —
the documented injection knob for testing that the gate actually fails
(tests/test_perf_gate.py; VERDICT round-4 item 3 "test via an env knob").

Usage:  perf_gate.py [--expect-all] [logfile ...]   (no args/'-': stdin)
"""

from __future__ import annotations

import json
import os
import sys

BASELINE_PATH = os.path.join(os.path.dirname(__file__), "perf_baseline.json")


def iter_records(lines):
    """Yield parsed bench JSON records from raw log lines."""
    for line in lines:
        line = line.strip()
        if not (line.startswith("{") and '"metric"' in line):
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(rec, dict) and "metric" in rec and "value" in rec:
            yield rec


def gate(lines, baseline, scale: float = 1.0):
    """Returns (failures, best: {metric: value}, checked: [metric])."""
    metrics = baseline["metrics"]
    tol = float(baseline.get("tolerance", 0.12))
    best: dict = {}
    for rec in iter_records(lines):
        spec = metrics.get(rec["metric"])
        if spec is None:
            continue
        require = spec.get("require") or {}
        if any(str(rec.get(k)) != str(v) for k, v in require.items()):
            continue
        val = float(rec["value"]) * scale
        if val > best.get(rec["metric"], float("-inf")):
            best[rec["metric"]] = val
    failures = []
    for name, val in best.items():
        floor = float(metrics[name]["min_expected"]) * (1.0 - tol)
        if val < floor:
            failures.append((name, val, floor))
    return failures, best, sorted(best)


def main(argv):
    with open(BASELINE_PATH) as f:
        baseline = json.load(f)
    scale = float(os.environ.get("PERF_GATE_SCALE", "1.0"))
    args = argv[1:]
    expect_all = "--expect-all" in args
    paths = [a for a in args if a not in ("-", "--expect-all")]
    lines = []
    if paths:
        for p in paths:
            with open(p, errors="replace") as f:
                lines.extend(f.readlines())
    else:
        lines = sys.stdin.readlines()

    failures, best, checked = gate(lines, baseline, scale)
    tol = float(baseline.get("tolerance", 0.12))
    if not checked:
        print(
            "[perf-gate] FAIL: no gated metrics found in the input — a "
            "log with nothing to check must not pass"
        )
        return 2
    missing = sorted(set(baseline["metrics"]) - set(checked))
    if expect_all and missing:
        print(
            "[perf-gate] FAIL: gated metric(s) missing from the input "
            f"(--expect-all): {', '.join(missing)} — a crashed bench stage "
            "must not pass the gate by omission"
        )
        return 2
    for name in checked:
        floor = float(baseline["metrics"][name]["min_expected"]) * (1 - tol)
        status = "FAIL" if any(f[0] == name for f in failures) else "ok"
        print(
            f"[perf-gate] {status}: {name} = {best[name]:.2f} "
            f"(floor {floor:.2f} = baseline - {tol * 100:.0f}%)"
        )
    if scale != 1.0:
        print(f"[perf-gate] note: PERF_GATE_SCALE={scale} applied (test mode)")
    if failures:
        print(
            "[perf-gate] REGRESSION — if a slower baseline is being "
            "accepted on purpose, change scripts/perf_baseline.json "
            "explicitly (that diff is the review surface)"
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
