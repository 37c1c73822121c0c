#!/bin/bash
# Preemption/elastic soak on the real chip (VERDICT round-3 item 8).
#
# Drives the FULL training CLI (train_representation.py) at the reference
# README command's hyperparameters (size=50, langweight=1.0, l1weight=1e-5,
# doaug=rctraj, lr=1e-4, bs=16 — /root/reference/README.md:32) for
# $STEPS steps on a synthetic 224px Ego4D fixture, and exercises the
# eviction contract the reference delegates to submitit
# (/root/reference/r3m/cfgs/hydra/launcher/local.yaml):
#
#   phase A: train; at step >= $KILL_AT send SIGTERM — the workspace must
#            finish the in-flight step, write a final snapshot, and exit 0
#            (training/workspace.py SIGTERM handler);
#   phase B: re-invoke the SAME command — auto-resume from the rolling
#            snapshot, prune stale train.csv rows, run to $STEPS;
#   checks:  exit codes, resume step > kill step, per-step snapshot count
#            respects keep_snapshots=2, final train.csv reaches $STEPS.
#
# Results are recorded in BASELINE.md ("round-4 preemption soak").
# Usage: scripts/soak_preempt.sh   [env: RUN STEPS KILL_AT BS PY]
set -u
cd "$(dirname "$0")/.."
PY=${PY:-python}
RUN=${RUN:-/tmp/r3m_soak_r4}
STEPS=${STEPS:-500}
KILL_AT=${KILL_AT:-250}
BS=${BS:-16}

rm -rf "$RUN"; mkdir -p "$RUN/lang"

echo "=== fixture: synthetic Ego4D + random DistilBERT ($RUN) ==="
$PY - "$RUN" <<'EOF'
import os, sys
run = sys.argv[1]
import jax
from r3m_tpu.checkpoint import save_snapshot
from r3m_tpu.data.ego4d import write_synthetic_dataset
from r3m_tpu.models.distilbert import distilbert_init
write_synthetic_dataset(os.path.join(run, "data"), n_videos=40, size=224, seed=3)
save_snapshot(os.path.join(run, "lang", "bert.npz"),
              distilbert_init(jax.random.PRNGKey(9)))
with open(os.path.join(run, "lang", "vocab.txt"), "w") as f:
    f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "c", "opens",
                       "the", "door", "picks", "up", "a", "cup"]) + "\n")
print("fixture ready")
EOF

launch() {
  $PY train_representation.py \
    "datapath=$RUN/data" "log_dir=$RUN" "batch_size=$BS" \
    "train_steps=$STEPS" "eval_freq=150" "keep_snapshots=2" \
    "num_workers=4" "metric_flush=10" \
    "agent.size=50" "agent.langweight=1.0" "lr=1e-4" "doaug=rctraj" \
    "bert_weights=$RUN/lang/bert.npz" "vocab_path=$RUN/lang/vocab.txt" \
    >> "$RUN/$1.log" 2>&1 &
  echo $! > "$RUN/run.pid"
}

last_step() {  # newest step in train.csv (0 if none yet)
  $PY - "$RUN/train.csv" <<'EOF'
import csv, sys, os
p = sys.argv[1]
step = 0
if os.path.exists(p):
    with open(p) as f:
        for row in csv.DictReader(f):
            if row.get("step"):
                step = max(step, int(float(row["step"])))
print(step)
EOF
}

echo "=== phase A: train to $STEPS, SIGTERM at step >= $KILL_AT ==="
launch phaseA
PID=$(cat "$RUN/run.pid")
SENT_TERM=0
while kill -0 "$PID" 2>/dev/null; do
  sleep 20
  S=$(last_step)
  echo "  [watch] step $S"
  if [ "$S" -ge "$KILL_AT" ]; then
    echo "  [watch] step $S >= $KILL_AT — sending SIGTERM"
    kill -TERM "$PID"
    SENT_TERM=1
    break
  fi
done
wait "$PID"; RC_A=$?
KILLED_AT=$(last_step)
echo "phase A exit=$RC_A, last logged step=$KILLED_AT"
ls -la "$RUN"/snapshot*.npz

echo "=== phase B: same command — auto-resume to $STEPS ==="
launch phaseB
PID=$(cat "$RUN/run.pid")
wait "$PID"; RC_B=$?
FINAL=$(last_step)
SNAPS=$(ls "$RUN" | grep -c 'snapshot_[0-9]*\.npz' || true)
echo "phase B exit=$RC_B, final step=$FINAL, per-step snapshots kept=$SNAPS"
ls -la "$RUN"/snapshot*.npz
echo "--- last train.csv rows ---"
tail -3 "$RUN/train.csv"

FAIL=0
# Guard against a VACUOUS pass: if phase A finished all $STEPS before the
# watcher's first poll (fast configs / small $STEPS), no SIGTERM was ever
# sent and the "soak" never exercised preemption or resume — that is a
# failure of the soak, not of the trainer.
[ "$SENT_TERM" -eq 1 ] || { echo "FAIL: phase A completed before SIGTERM was sent — nothing was preempted (raise STEPS or lower KILL_AT)"; FAIL=1; }
[ "$KILLED_AT" -lt "$STEPS" ] || { echo "FAIL: kill landed at step $KILLED_AT >= $STEPS — phase B had nothing to resume"; FAIL=1; }
[ "$RC_A" -eq 0 ] || { echo "FAIL: phase A exited $RC_A (SIGTERM must be graceful)"; FAIL=1; }
[ "$RC_B" -eq 0 ] || { echo "FAIL: phase B exited $RC_B"; FAIL=1; }
[ "$FINAL" -ge "$STEPS" ] || { echo "FAIL: final step $FINAL < $STEPS"; FAIL=1; }
[ "$SNAPS" -le 2 ] || { echo "FAIL: $SNAPS per-step snapshots kept (keep_snapshots=2)"; FAIL=1; }
[ "$FAIL" -eq 0 ] && echo "SOAK OK: preempt at ~$KILLED_AT, resumed, reached $FINAL"
exit $FAIL
