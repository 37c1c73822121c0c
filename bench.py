"""Headline benchmark: full R3M pretrain step throughput (frames/sec/chip).

Measures the reference's hot loop (``/root/reference/r3m/trainer.py:25-162``
under the README train command: resnet50, langweight=1.0, tcnweight=1.0,
l1weight=1e-5, doaug=rctraj) as ONE jitted TPU program: on-device rctraj
RandomResizedCrop, 5-frame batched resnet50 encode, frozen DistilBERT
sentence embedding, batched language + TCN InfoNCE, backward, Adam.

The reference publishes no numbers (BASELINE.md); the baseline constant
below is the standard public figure for torch resnet50 mixed-precision
training throughput on ONE A100 (~2500 img/s, MLPerf-class implementations;
an upper bound for the reference's torch-1.7.1 DataParallel step, which
also pays DataLoader IPC + H2D per step). vs_baseline = frames/sec/chip
against that A100 figure; the north-star target is >= 2.0.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

A100_BASELINE_FPS = 2500.0  # resnet50 train img/s on one A100 (see docstring)


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(os.environ.get("BENCH_CACHE", "~/.cache/r3m_tpu_xla")),
    )
    from r3m_tpu.models.distilbert import distilbert_init
    from r3m_tpu.models.r3m import R3MConfig
    from r3m_tpu.training.trainer import create_train_state, make_train_step

    bs = int(os.environ.get("BENCH_BS", "64"))
    # 50 steps ≈ 7 s of measured device time: two uncontended 50-step runs
    # landed within 0.1% of each other, vs ±7% across 20-step runs.
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    compute_dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    size = int(os.environ.get("BENCH_SIZE", "50"))  # 18|34|50|0 (ViT-B/32)
    cfg = R3MConfig(
        size=size,
        langweight=1.0,
        tcnweight=1.0,
        l1weight=1e-5,
        bs=bs,
        compute_dtype=compute_dtype,
        remat=os.environ.get("BENCH_REMAT", "none"),
    )
    key = jax.random.PRNGKey(0)
    k_state, k_img = jax.random.split(key)
    # Random BERT weights: identical compute/memory cost to converted ones.
    bert_params = distilbert_init(jax.random.PRNGKey(1))
    state = create_train_state(cfg, k_state)

    t = 32  # lang_max_len (cfgs/config_rep.yaml)
    batch = {
        "images": jax.random.uniform(
            k_img, (bs, 5, 224, 224, 3), minval=0.0, maxval=255.0
        ),
        "token_ids": jnp.ones((bs, t), jnp.int32),
        "attn_mask": jnp.ones((bs, t), jnp.int32),
        "lang_mask": jnp.ones((bs,), jnp.float32),
    }
    step = make_train_step(cfg, bert_params=bert_params, doaug="rctraj")

    for _ in range(3):  # compile + warmup
        state, metrics = step(state, batch)
    float(metrics["full_loss"])  # hard host sync (value fetch)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    # Steps chain through `state`, so fetching the last step's loss value
    # waits for the whole sequence — a hard sync even if block_until_ready
    # returns early on experimental platforms. A plain statement, NOT an
    # assert: `python -O` strips asserts (timing would measure only async
    # dispatch), and a NaN loss must still report rather than crash.
    float(metrics["full_loss"])
    dt = time.perf_counter() - t0

    fps = bs * 5 * steps / dt
    print(
        json.dumps(
            {
                "metric": (
                    "r3m_pretrain_resnet50_frames_per_sec_per_chip"
                    if size == 50
                    else f"r3m_pretrain_size{size}_frames_per_sec_per_chip"
                ),
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / A100_BASELINE_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    # the tunneled-TPU backend occasionally fails to initialize transiently;
    # retry before giving up so a hiccup doesn't read as a benchmark failure
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:
            if attempt == 2:
                raise
            print(f"[bench] retrying after {type(e).__name__}: {e}")
            time.sleep(10)
