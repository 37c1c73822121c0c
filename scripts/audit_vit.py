"""Per-op roofline audit of the ViT-B/32 train step + fused-attention bench.

VERDICT round-2 item 3: the resnet50 step got a quantitative per-op audit
(BASELINE.md); the ViT-B/32 path (`BENCH_SIZE=0`, called "MXU-bound" there)
never did. This script produces, on the real chip:

1. an xprof op-profile table of the full size=0 train step (same
   methodology as the resnet50 audit: `r3m_tpu.utils.profiling`),
2. a microbench of the attention block alone — einsum path vs the fused
   Pallas kernel (`ops/attention.py`) — fwd and fwd+bwd at the bench shape
   [160, 50, 768] / 12 heads,
3. end-to-end bench step times with `vit_fused_attn` off/on.

Results fed the accept/reject entry in BASELINE.md (round 4): the batched
lowering won (3) and is the training default via `vit_fused_attn="auto"`;
this script stays as the reproduction path for that entry.

Usage: python scripts/audit_vit.py [--bs 32] [--steps 20] [--profile-dir D]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from r3m_tpu.utils.misc import honor_jax_platforms_env  # noqa: E402

# sitecustomize consumes JAX_PLATFORMS at interpreter start — re-apply it so
# `JAX_PLATFORMS=cpu python scripts/audit_vit.py` really runs on CPU.
honor_jax_platforms_env()


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def _time_fn(fn, args, iters):
    for _ in range(3):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def attention_microbench(b=160, t=50, h=12, d=64, dtype=jnp.bfloat16, iters=50):
    from r3m_tpu.ops.attention import fused_attention
    from tests.test_attention import _ref_attention

    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(kk, (b, t, h * d), dtype) for kk in jax.random.split(key, 3)
    )
    w = jax.random.normal(key, (b, t, h * d), dtype)

    interpret = jax.default_backend() == "cpu"
    results = {}
    for name, fn in (
        ("einsum", functools.partial(_ref_attention, n_heads=h)),
        ("fused", functools.partial(fused_attention, n_heads=h, interpret=interpret)),
        ("fused_batched", functools.partial(
            fused_attention, n_heads=h, interpret=interpret, batched=True)),
    ):
        fwd = jax.jit(fn)
        results[f"{name}_fwd_ms"] = _time_fn(fwd, (q, k, v), iters) * 1e3

        def loss(q, k, v, fn=fn):
            return jnp.sum((w * fn(q, k, v)).astype(jnp.float32))

        grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        results[f"{name}_fwdbwd_ms"] = _time_fn(grad, (q, k, v), iters) * 1e3
    return results


def step_bench(bs, steps, fused, profile_dir=None):
    from r3m_tpu.models.distilbert import distilbert_init
    from r3m_tpu.models.r3m import R3MConfig
    from r3m_tpu.training.trainer import create_train_state, make_train_step

    cfg = R3MConfig(
        size=0, langweight=1.0, tcnweight=1.0, l1weight=1e-5, bs=bs,
        compute_dtype="bfloat16", vit_fused_attn=fused,
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

    if profile_dir:
        from r3m_tpu.utils.profiling import print_op_profile, trace

        with trace(profile_dir):
            for _ in range(4):
                state, metrics = step(state, batch)
            float(metrics["full_loss"])
        label = {False: "einsum", True: "fused"}.get(fused, f"fused_{fused}")
        print(f"\n== op profile ({label}) ==")
        print_op_profile(profile_dir, top=20)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    float(metrics["full_loss"])
    dt = (time.perf_counter() - t0) / steps
    return {"step_ms": dt * 1e3, "frames_per_s": bs * 5 / dt}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--profile-dir", default=None)
    p.add_argument("--skip-micro", action="store_true")
    a = p.parse_args(argv)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(os.environ.get("BENCH_CACHE", "~/.cache/r3m_tpu_xla")),
    )
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    if not a.skip_micro:
        micro = attention_microbench(b=a.bs * 5)
        print("\n== attention microbench [B=%d, 50, 768] bf16 ==" % (a.bs * 5))
        for k, v in micro.items():
            print(f"  {k}: {v:.3f}")

    for fused in (False, True, "batched"):
        pdir = (
            os.path.join(a.profile_dir, f"fused_{fused}".lower())
            if a.profile_dir
            else None
        )
        r = step_bench(a.bs, a.steps, fused, profile_dir=pdir)
        print(
            f"\n== full step size=0 bs={a.bs} fused={fused}: "
            f"{r['step_ms']:.2f} ms, {r['frames_per_s']:.1f} frames/s =="
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
