"""Production-config collective budget + weak-scaling curve (virtual CPU mesh).

VERDICT round-3 item 6: docs/DESIGN.md's per-step collective budget for the
production config (~130 MB gradient all-reduce -> ~1% step overhead on ICI)
was arithmetic, scaled from the 8-device TEST-config HLO
(tests/test_train_step.py::test_multichip_collective_bytes_budget). This
script replaces the arithmetic with measurements of the production program
itself, as far as a TPU-less host allows:

  --prod     lower + compile the REAL production train step (resnet50,
             224 px, langweight=1.0, full-geometry DistilBERT, rctraj aug,
             global bs = 16 clips/chip x 8 devices) on the 8-virtual-device
             CPU mesh and print `collective_cost_report` of the optimized
             SPMD module — the actual all-reduce / all-gather bytes GSPMD
             inserts, no execution.

  --scaling  wall-clock weak-scaling curve at FIXED per-device batch over
             1/2/4/8-device meshes (small config: resnet18 / 32 px — CPU
             executes the step for real). This host has ONE core, so the
             N virtual devices serialize and T(N) ~= N * T(1) even for a
             perfect program; the meaningful statistic reported is
             overhead(N) = T(N) / (N * T(1)), the SPMD partition +
             collective overhead ratio (1.0 = free collectives). It is the
             best stand-in for multi-chip timing available without
             hardware (BASELINE.md records the caveat alongside).

Both modes print machine-readable JSON lines prefixed with `RESULT `.

The reference has no counterpart (DataParallel hides its scatter/gather,
/root/reference/r3m/train_representation.py:29-31); the budget here is the
explicit contract that design must honor.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import numpy as np  # noqa: E402

import jax  # noqa: E402

# sitecustomize consumes JAX_PLATFORMS at interpreter start; backends
# initialize lazily so this still forces CPU (same pattern as tests/).
jax.config.update("jax_platforms", "cpu")

from r3m_tpu.models.distilbert import DistilBertConfig, distilbert_init  # noqa: E402
from r3m_tpu.models.r3m import R3MConfig  # noqa: E402
from r3m_tpu.parallel.mesh import (  # noqa: E402
    collective_cost_report,
    make_mesh,
    replicate,
    shard_batch,
)
from r3m_tpu.training.trainer import create_train_state, make_train_step  # noqa: E402


def _batch(rng, bs, px, t=32, vocab=30522):
    return {
        "images": rng.uniform(0, 255, size=(bs, 5, px, px, 3)).astype(np.float32),
        "token_ids": rng.integers(0, vocab, size=(bs, t)).astype(np.int32),
        "attn_mask": np.ones((bs, t), dtype=np.int32),
        "lang_mask": np.ones((bs,), dtype=np.float32),
    }


def prod_budget(bs_per_chip: int = 16) -> dict:
    cfg = R3MConfig(
        size=50, langweight=1.0, tcnweight=1.0, l1weight=1e-5,
        bs=bs_per_chip * 8, compute_dtype="bfloat16",
    )
    mesh = make_mesh(8)
    bert = distilbert_init(jax.random.PRNGKey(1))  # real geometry
    host_state = create_train_state(cfg, jax.random.PRNGKey(0))
    param_bytes = sum(
        int(np.prod(np.shape(x))) * 4
        for x in jax.tree_util.tree_leaves(host_state.params)
    )
    state = replicate(mesh, host_state)
    step = make_train_step(cfg, bert_params=bert, mesh=mesh, doaug="rctraj",
                           donate=False)
    batch = shard_batch(mesh, _batch(np.random.default_rng(0), cfg.bs, 224))

    t0 = time.perf_counter()
    hlo = step.lower(state, batch).compile().as_text()
    compile_s = time.perf_counter() - t0

    report = collective_cost_report(hlo)
    out = {
        "mode": "prod_budget",
        "config": f"resnet50/224px/bs={cfg.bs} global (16/chip), langweight=1, rctraj, bf16",
        "mesh": "8-device dp (virtual CPU)",
        "trainable_param_bytes_f32": param_bytes,
        "compile_s": round(compile_s, 1),
        "collectives": report,
    }
    print("RESULT " + json.dumps(out))
    return out


def weak_scaling(per_device_bs: int = 4, steps: int = 5) -> dict:
    cfg = R3MConfig(
        size=18, hidden_dim=64, l2weight=1e-5, l1weight=1e-5, tcnweight=1.0,
        langweight=1.0, image_size=32,
    )
    bert = distilbert_init(
        jax.random.PRNGKey(7),
        DistilBertConfig(vocab_size=100, dim=768, n_layers=1, n_heads=4,
                         hidden_dim=128, max_position_embeddings=16),
    )
    rows = []
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        state = replicate(mesh, create_train_state(cfg, jax.random.PRNGKey(0)))
        step = make_train_step(cfg, bert_params=bert, mesh=mesh, donate=False)
        batch = shard_batch(
            mesh, _batch(np.random.default_rng(3), per_device_bs * n, 32,
                         t=12, vocab=100)
        )
        for _ in range(2):  # compile + warm
            state, metrics = step(state, batch)
        float(metrics["full_loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step(state, batch)
        float(metrics["full_loss"])  # hard sync
        dt = (time.perf_counter() - t0) / steps
        rows.append({"devices": n, "step_ms": round(dt * 1e3, 1)})
        print(f"[scaling] {n} device(s): {dt * 1e3:.1f} ms/step "
              f"({per_device_bs} clips/device)")
    t1 = rows[0]["step_ms"]
    for r in rows:
        r["overhead_ratio"] = round(r["step_ms"] / (r["devices"] * t1), 3)
    out = {
        "mode": "weak_scaling",
        "config": f"resnet18/32px/{per_device_bs} clips per device, langweight=1",
        "note": ("1-core host: devices serialize; overhead_ratio = "
                 "T(N)/(N*T(1)), 1.0 = free collectives"),
        "rows": rows,
    }
    print("RESULT " + json.dumps(out))
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--prod", action="store_true")
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--bs-per-chip", type=int, default=16)
    a = p.parse_args(argv)
    if not (a.prod or a.scaling):
        a.prod = a.scaling = True
    print(f"backend: {jax.default_backend()}, {len(jax.devices())} devices")
    if a.scaling:
        weak_scaling()
    if a.prod:
        prod_budget(a.bs_per_chip)
    return 0


if __name__ == "__main__":
    sys.exit(main())
