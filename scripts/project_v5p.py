"""v5p projection artifact: per-op-class arithmetic from a real v5e trace.

VERDICT round-3 item 7: BASELINE.md argued the 2x-A100 north star
(BASELINE.json) follows from v5p's bandwidth on this HBM-bound program as
one line of prose. This script replaces the prose with arithmetic a
reviewer can check, derived mechanically from a fresh xprof op profile of
the headline step on the REAL chip:

For every op category (rawTime t, rawFlops f, rawBytes b from xprof):

    roofline(chip) = max(b / BW_chip, f / FLOPS_chip)   # lower time bound
    efficiency     = roofline(v5e) / t                  # achieved on v5e
    t_v5p          = roofline(v5p) / efficiency         # same efficiency

i.e. each op keeps the fraction of its binding roofline it demonstrably
sustains on v5e. Ops reporting no flops/bytes (copies, infeed glue) are
scaled by the HBM bandwidth ratio — they are memory movement; the table
flags them. MXU-bound ops are checked against v5p's 459 TF/s peak.

Chips (public datasheet numbers): v5e 819 GB/s HBM / 197 TF/s bf16;
v5p 2765 GB/s / 459 TF/s.

Run on the real chip: `python scripts/project_v5p.py [--bs 64 --steps 4]`.
Prints the per-op table + one `RESULT {...}` JSON line; the committed copy
lives in BASELINE.md ("v5p projection").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from r3m_tpu.utils.misc import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()

V5E = {"bw": 819e9, "flops": 197e12}
V5P = {"bw": 2765e9, "flops": 459e12}


def capture_profile(bs: int, trace_steps: int, profile_dir: str):
    from r3m_tpu.models.distilbert import distilbert_init
    from r3m_tpu.models.r3m import R3MConfig
    from r3m_tpu.training.trainer import create_train_state, make_train_step
    from r3m_tpu.utils.profiling import trace

    cfg = R3MConfig(
        size=50, langweight=1.0, tcnweight=1.0, l1weight=1e-5, bs=bs,
        compute_dtype="bfloat16",
    )
    key = jax.random.PRNGKey(0)
    bert_params = distilbert_init(jax.random.PRNGKey(1))
    state = create_train_state(cfg, key)
    batch = {
        "images": jax.random.uniform(key, (bs, 5, 224, 224, 3), maxval=255.0),
        "token_ids": jnp.ones((bs, 32), jnp.int32),
        "attn_mask": jnp.ones((bs, 32), jnp.int32),
        "lang_mask": jnp.ones((bs,), jnp.float32),
    }
    step = make_train_step(cfg, bert_params=bert_params, doaug="rctraj")
    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics["full_loss"])

    t0 = time.perf_counter()
    for _ in range(10):
        state, metrics = step(state, batch)
    float(metrics["full_loss"])
    step_s = (time.perf_counter() - t0) / 10

    with trace(profile_dir):
        for _ in range(trace_steps):
            state, metrics = step(state, batch)
        float(metrics["full_loss"])
    return step_s


def raw_rows(profile_dir: str, top: int = 24):
    """(time_ps, flops, bytes, occurrences, name) per op category —
    the shared xprof parser behind every audit (utils/profiling.py)."""
    from r3m_tpu.utils.profiling import op_profile_raw

    return op_profile_raw(profile_dir, top)


def project(rows, all_time_ps: float, bs: int, step_s: float):
    total_t = sum(r[0] for r in rows)
    out_rows, t_v5p_total = [], 0.0
    for t_ps, f, b, occ, name in rows:
        t = t_ps / 1e12  # rawTime is picoseconds
        if f or b:
            bound_e = max(b / V5E["bw"], f / V5E["flops"])
            bound_p = max(b / V5P["bw"], f / V5P["flops"])
            eff = bound_e / t
            t_p = bound_p / eff
            binding_p = "mxu" if f / V5P["flops"] > b / V5P["bw"] else "hbm"
        else:
            eff = float("nan")
            t_p = t * V5E["bw"] / V5P["bw"]
            binding_p = "hbm(copy)"
        t_v5p_total += t_p
        out_rows.append({
            "name": name,
            "time_frac_v5e": round(t_ps / total_t, 4),
            "tf_per_s_v5e": round(f / t / 1e12, 1) if t else 0.0,
            "gb_per_s_v5e": round(b / t / 1e9, 0) if t else 0.0,
            "roofline_eff": round(eff, 3) if eff == eff else None,
            "v5p_binding": binding_p,
            "speedup_v5p": round(t / t_p, 2),
        })
    # the tail outside `top` inherits the table's aggregate speedup
    # (coverage below tells the reviewer how much that approximates)
    speedup = total_t / 1e12 / t_v5p_total
    frames = bs * 5
    fps_v5e = frames / step_s
    fps_v5p = fps_v5e * speedup
    return out_rows, {
        "measured_step_ms_v5e": round(step_s * 1e3, 2),
        "measured_fps_v5e": round(fps_v5e, 1),
        "device_time_speedup_v5p": round(speedup, 2),
        "projected_fps_v5p": round(fps_v5p, 1),
        "vs_2x_a100_target": round(fps_v5p / 5000.0, 3),
        "table_time_coverage": round(total_t / all_time_ps, 3),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--profile-dir", default="/tmp/v5p_projection_trace")
    p.add_argument("--top", type=int, default=24)
    a = p.parse_args(argv)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(os.environ.get("BENCH_CACHE", "~/.cache/r3m_tpu_xla")),
    )
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    if jax.default_backend() == "cpu":
        print("FATAL: needs the real chip (CPU traces carry no op metrics)")
        return 2

    import shutil

    shutil.rmtree(a.profile_dir, ignore_errors=True)
    step_s = capture_profile(a.bs, a.steps, a.profile_dir)
    rows, all_time_ps = raw_rows(a.profile_dir, a.top)
    table, summary = project(rows, all_time_ps, a.bs, step_s)

    print(f"\n{'op category':42s} {'t%':>6s} {'TF/s':>6s} {'GB/s':>6s} "
          f"{'eff':>6s} {'v5p bind':>9s} {'v5p x':>6s}")
    for r in table:
        print(
            f"{r['name'][:42]:42s} {100 * r['time_frac_v5e']:5.1f}% "
            f"{r['tf_per_s_v5e']:6.1f} {r['gb_per_s_v5e']:6.0f} "
            f"{r['roofline_eff'] if r['roofline_eff'] is not None else '  n/a'!s:>6s} "
            f"{r['v5p_binding']:>9s} {r['speedup_v5p']:6.2f}"
        )
    print()
    print("RESULT " + json.dumps({"summary": summary, "table": table}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
