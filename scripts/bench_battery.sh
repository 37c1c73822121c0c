#!/bin/bash
# Reproduce every BASELINE.md measurement in one run.
#
# Probes the TPU until it responds (the tunneled backend can be down or
# stall transiently — see docs/DESIGN.md), then runs the measurement
# stages CHEAPEST / HIGHEST-PRIORITY FIRST so a brief tunnel-up window
# still yields the key numbers. `python -u` everywhere so a
# timeout-killed stage still leaves its partial output in the log.
#
# Usage:  scripts/bench_battery.sh [logfile]     (default /tmp/bench_battery.log)
PY="${PYTHON:-/opt/venv/bin/python} -u"
LOG="${1:-/tmp/bench_battery.log}"
cd "$(dirname "$0")/.."
# The named log APPENDS across battery runs (history); the gate below must
# see only THIS run's records — a healthy number from yesterday's appended
# run would otherwise mask today's regression (perf_gate keeps the best
# reading per metric; review finding). RUNLOG is fresh per invocation.
RUNLOG=$(mktemp /tmp/bench_battery_run.XXXXXX.log)
exec > >(tee -a "$LOG" "$RUNLOG") 2>&1

echo "=== battery start $(date) ==="
n=0
while true; do
  n=$((n+1))
  echo "--- probe $n $(date) ---"
  if timeout 180 $PY -c "import jax; import jax.numpy as jnp; assert jax.default_backend() == 'tpu', f'backend fell back to {jax.default_backend()}'; print('TPU OK', jax.devices(), float(jnp.ones(4).sum()))"; then
    break
  fi
  echo "probe failed; sleeping 120s"
  sleep 120
done

echo "=== TPU up $(date); stage 0: on-chip kernel lowering tier ==="
# Compiles every Pallas kernel on the real chip BEFORE trusting the perf
# stages (round 3's Mosaic block-shape failure was invisible to the
# interpret-mode tests). A red stage 0 means the perf numbers that follow
# exercise broken kernels — abort loudly. The tier FAILS (not skips) if
# libtpu falls back to CPU mid-battery, so an all-skipped vacuous green
# cannot slip through this gate (tests/test_tpu_kernels.py).
if ! R3M_TPU_TESTS=1 timeout 1800 $PY -m pytest -m tpu tests/test_tpu_kernels.py -q; then
  echo "FATAL: on-chip kernel tier failed; not benchmarking broken kernels"
  exit 1
fi

echo "=== stage 1: headline bench (resnet50) $(date) ==="
BENCH_STEPS=50 timeout 1200 $PY bench.py

echo "=== stage 2: e2e data bench bs=64 $(date) ==="
BENCH_DATA=auto BENCH_STEPS=50 timeout 2400 $PY bench.py

echo "=== stage 3: ViT train headline, einsum vs fused attention $(date) ==="
# NOTE: `auto` resolves to `batched` for the train step (the measured
# round-4 winner) — the first run compiles the same program as the last
# and is kept deliberately as a confirmation that the DEFAULT config
# reproduces the explicit-`batched` number. The JSON line carries a
# `vit_fused` tag so the four runs stay attributable in this log.
BENCH_SIZE=0 BENCH_VIT_FUSED=auto BENCH_STEPS=50 timeout 1200 $PY bench.py
BENCH_SIZE=0 BENCH_VIT_FUSED=0 BENCH_STEPS=50 timeout 1200 $PY bench.py
BENCH_SIZE=0 BENCH_VIT_FUSED=1 BENCH_STEPS=50 timeout 1200 $PY bench.py
BENCH_SIZE=0 BENCH_VIT_FUSED=batched BENCH_STEPS=50 timeout 1200 $PY bench.py

echo "=== stage 4: ViT audit (micro + per-op profile) $(date) ==="
rm -rf /tmp/vit_audit
timeout 3000 $PY scripts/audit_vit.py --bs 32 --steps 30 --profile-dir /tmp/vit_audit

echo "=== stage 5: serving bench $(date) ==="
BENCH_EVAL=1 BENCH_STEPS=30 timeout 1800 $PY bench.py
BENCH_EVAL=1 BENCH_SIZE=0 BENCH_STEPS=30 timeout 1800 $PY bench.py

echo "=== stage 5b: fast-serving lever (bf16 folded; prints fast-vs-parity cosine) $(date) ==="
BENCH_EVAL=1 BENCH_PRECISION=fast BENCH_STEPS=20 timeout 1800 $PY bench.py
# ViT fast serving auto-resolves to the batched fused-attention kernel
# (accepted round 4: +8.2% over einsum forward-only); the second run pins
# the einsum comparison point so the accept stays re-checkable.
BENCH_EVAL=1 BENCH_SIZE=0 BENCH_PRECISION=fast BENCH_STEPS=20 timeout 1800 $PY bench.py
BENCH_EVAL=1 BENCH_SIZE=0 BENCH_PRECISION=fast BENCH_VIT_FUSED=0 BENCH_STEPS=20 timeout 1800 $PY bench.py

echo "=== stage 6: v5p projection (per-op arithmetic from a fresh trace) $(date) ==="
timeout 1800 $PY scripts/project_v5p.py

echo "=== stage 7: perf-regression gate $(date) ==="
# Compares every gated metric this log produced against the committed
# constants in scripts/perf_baseline.json (12% tolerance over the recorded
# +-7% run variance). A red gate means the battery MEASURED a regression —
# accepting a slower baseline must be an explicit diff to that file.
# Gate THIS run only (RUNLOG, not the appended history), and require every
# baseline metric to be present — a crashed ViT stage must not let the
# rest of the battery pass on its behalf.
if ! $PY scripts/perf_gate.py --expect-all "$RUNLOG"; then
  echo "FATAL: perf-regression gate failed (see [perf-gate] lines above)"
  exit 1
fi

echo "=== battery done $(date) ==="
echo "(CPU-mesh artifacts — collective budget + weak scaling — are separate:"
echo "   python scripts/audit_collectives.py   # needs no TPU, heavy CPU)"
