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

if os.environ.get("JAX_PLATFORMS"):
    # sitecustomize may initialize JAX at interpreter start and consume the
    # env var — re-apply so `JAX_PLATFORMS=cpu python bench.py` really runs
    # on CPU (backends initialize lazily; jax.config wins)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

A100_BASELINE_FPS = 2500.0  # resnet50 train img/s on one A100 (see docstring)

# BENCH_DATA=<dir>|auto switches to the end-to-end mode: the same train step
# fed by the REAL input stack (Ego4DDataset manifest sampling -> native JPEG
# decode -> WordPiece tokenize -> DataPipeline producer thread -> device
# prefetch), reporting DELIVERED frames/s. This is the reference's actual
# README workflow bound (/root/reference/README.md:34 + r3m/utils/
# data_loaders.py:83-95: DataLoader(num_workers=10) feeding the GPU step).


def _parse_fused(v: str):
    """BENCH_VIT_FUSED: 'auto' (default — what users get: the measured
    round-4 winner, batched kernel for training), '0' -> einsum,
    '1' -> unrolled kernel, 'batched' -> the 3-D-dot kernel variant."""
    if v in ("auto", "batched"):
        return v
    return bool(int(v))


def _h2d_link_probe(step_bytes: int, frame_bytes: int) -> None:
    """Print a lower bound on the host->device link rate.

    Times `device_put` of a step-sized uint8 buffer synced by fetching ONE
    element's value (a 1-element D2H after the upload completes) — a hard
    sync that adds negligible return traffic, unlike a full-array reduce.
    The printed MB/s still includes dispatch + the tiny D2H round trip, so
    it is a LOWER BOUND on the raw link, good enough to attribute whether
    a delivered-throughput number below is link-bound.
    """
    import numpy as np

    probe = np.random.default_rng(0).integers(0, 256, step_bytes, dtype=np.uint8)
    float(jnp.asarray(probe)[0])  # warm the transfer + slice programs
    t0 = time.perf_counter()
    float(jnp.asarray(probe)[0])
    link = step_bytes / (time.perf_counter() - t0) / 1e6
    print(
        f"[bench] H2D link (round-trip lower bound): {link:.1f} MB/s for the "
        f"{step_bytes / 1e6:.1f} MB uint8 step batch -> link-bound ceiling "
        f"~{link * 1e6 / frame_bytes:.0f} frames/s"
    )


def _ensure_fixture(root: str) -> str:
    """Synthetic 224px Ego4D-layout fixture (written once, reused)."""
    from r3m_tpu.data.ego4d import write_synthetic_dataset

    if not os.path.exists(os.path.join(root, "manifest.csv")):
        write_synthetic_dataset(root, n_videos=48, size=224)
    vocab = os.path.join(root, "vocab.txt")
    if not os.path.exists(vocab):
        with open(vocab, "w") as f:
            f.write(
                "\n".join(
                    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "person", "moves",
                     "object"] + [str(i) for i in range(48)]
                )
                + "\n"
            )
    return root


def main_data():
    from r3m_tpu.data.ego4d import Ego4DDataset, FrameBatcher
    from r3m_tpu.data.pipeline import DataPipeline, ProducerQueue
    from r3m_tpu.models.distilbert import distilbert_init
    from r3m_tpu.models.r3m import R3MConfig
    from r3m_tpu.text.tokenizer import WordPieceTokenizer
    from r3m_tpu.training.trainer import create_train_state, make_train_step

    root = os.environ["BENCH_DATA"]
    if root in ("auto", "1"):
        root = "/tmp/r3m_bench_data"
    _ensure_fixture(root)

    bs = int(os.environ.get("BENCH_BS", "64"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    size = int(os.environ.get("BENCH_SIZE", "50"))
    n_threads = int(os.environ.get("BENCH_WORKERS", "8"))
    # BENCH_LANGW=0 skips the frozen-BERT stack (CPU-testable pipeline path)
    langw = float(os.environ.get("BENCH_LANGW", "1.0"))
    cfg = R3MConfig(
        size=size, langweight=langw, tcnweight=1.0, l1weight=1e-5, bs=bs,
        compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
    )
    ds = Ego4DDataset(root, alpha=0.2, seed=1)
    try:
        from r3m_tpu.data.decoder import NativeFramePipeline

        batcher = NativeFramePipeline(ds, bs, n_threads=n_threads)
    except RuntimeError as e:
        print(f"[bench] native pipeline unavailable ({e}); python decode")
        batcher = FrameBatcher(ds, bs, n_threads=n_threads)
    tok = WordPieceTokenizer(vocab_file=os.path.join(root, "vocab.txt"))

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    bert_params = distilbert_init(jax.random.PRNGKey(1)) if langw > 0 else None
    step = make_train_step(cfg, bert_params=bert_params, doaug="rctraj")

    def place(b):
        return {
            k: jnp.asarray(v) for k, v in b.items() if k != "captions"
        }

    # H2D link probe: a tunneled chip makes the per-step image upload
    # (bs*5 uint8 frames) the binding constraint; print the ceiling it
    # implies so the delivered number below is attributable (see
    # BASELINE.md "delivered throughput on the tunnel host").
    step_bytes = bs * 5 * 224 * 224 * 3
    _h2d_link_probe(step_bytes, step_bytes // (bs * 5))

    with DataPipeline(batcher, tokenizer=tok, lang_max_len=32) as pipe:
        placed = ProducerQueue(
            pipe, maxsize=2, transform=place, reserve_first=True,
            name="device prefetch",
        )
        try:
            for _ in range(3):  # compile + warmup + queue warm
                state, metrics = step(state, next(placed))
            float(metrics["full_loss"])
            wait = 0.0  # host-side stall: time blocked on the input queue
            t0 = time.perf_counter()
            for _ in range(steps):
                tw = time.perf_counter()
                batch = next(placed)
                wait += time.perf_counter() - tw
                state, metrics = step(state, batch)
            float(metrics["full_loss"])  # hard host sync (see main())
            dt = time.perf_counter() - t0
        finally:
            placed.close()

    print(
        f"[bench] input wait {wait / steps * 1e3:.1f} ms/step "
        f"({wait / dt * 100:.0f}% of wall) — the host-vs-device gap"
    )

    fps = bs * 5 * steps / dt
    print(
        json.dumps(
            {
                "metric": f"r3m_pretrain_size{size}_e2e_delivered_frames_per_sec",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / A100_BASELINE_FPS, 4),
            }
        )
    )


def main_eval():
    """BENCH_EVAL=1: serving throughput of the `load_r3m` inference path.

    The reference's primary downstream use is embedding extraction inside
    an RL/BC loop (``/root/reference/r3m/example.py:30-43``: NCHW [0,255]
    images -> ``r3m(...)`` -> [B, out_dim]). Measures the exact
    `R3MEncoder.__call__` law — BN-folded resnet, HIGHEST-precision f32
    (the parity-grade serving config) — two ways: the device-resident
    jitted forward alone (plain line), and delivered host-uint8 ->
    H2D -> preprocess -> encode (the JSON line). vs_baseline reuses the
    A100 TRAIN marker as a conservative floor (inference is cheaper than
    training, so >1.0 is the expected regime on healthy hardware).
    """
    import numpy as np

    from r3m_tpu.models.r3m import R3MConfig, R3MEncoder, r3m_init

    bs = int(os.environ.get("BENCH_BS", "256"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    size = int(os.environ.get("BENCH_SIZE", "50"))
    # "parity" = the load_r3m law (f32/HIGHEST); "fast" = bf16 folded
    # serving (R3MEncoder precision lever, measured in BASELINE.md)
    precision = os.environ.get("BENCH_PRECISION", "parity")
    # ViT-only: serving attention lowering. Default "auto" (= einsum at
    # inference — resolved_fused_attn); 1/batched opt into the Pallas
    # kernel to measure the fwd-only variants under serving precision.
    cfg = R3MConfig(
        size=size,
        langweight=0.0,
        vit_fused_attn=(
            _parse_fused(os.environ.get("BENCH_VIT_FUSED", "auto"))
            if size == 0
            else "auto"
        ),
    )
    state = r3m_init(jax.random.PRNGKey(0), cfg)
    enc = R3MEncoder(
        cfg, state["params"], state["batch_stats"], precision=precision
    )
    rng = np.random.default_rng(0)
    obs = rng.integers(
        0, 256, (bs, 3, cfg.image_size, cfg.image_size), dtype=np.uint8
    )

    # NOTE on syncing: a scalar VALUE fetch is used as the hard sync
    # everywhere in this file. Documented JAX semantics say
    # `jax.block_until_ready` suffices, but round-3 serving numbers taken
    # with it on this tunneled platform over-read by ~400x (see BASELINE.md
    # round-3 serving note); the value fetch is strictly stronger
    # (belt-and-suspenders) and costs one scalar D2H. The TPU stream
    # executes programs in launch order, so fetching a scalar of the LAST
    # call's output waits for the whole loop.
    def _sync(x):
        float(jnp.sum(x))

    # 0) host->device link probe: this host reaches the chip over a
    # tunnel, so delivered-throughput numbers are bounded by this link —
    # print it so the delivered number below is attributable.
    _h2d_link_probe(obs.nbytes, obs.nbytes // bs)

    # 1) device-resident: the compiled encoder program alone (what an
    # on-device pipeline — e.g. embeddings consumed by a jitted policy —
    # would see). enc._fwd is the module's own jitted forward.
    obs_dev = jnp.asarray(obs)
    out = None
    for _ in range(3):
        out = enc._fwd(enc.params, enc.batch_stats, obs_dev)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = enc._fwd(enc.params, enc.batch_stats, obs_dev)
    _sync(out)
    dev_fps = bs * steps / (time.perf_counter() - t0)
    print(f"[bench] device-resident encoder forward: {dev_fps:.1f} frames/s")

    if precision == "fast":
        # honest-mode check: print the fast-vs-parity embedding cosine on
        # this exact batch so the throughput row carries its accuracy cost.
        # The reference is the TRUE parity law — default attention lowering
        # (auto -> einsum at inference), even when this run opts the fast
        # path into a fused kernel via BENCH_VIT_FUSED.
        import dataclasses

        ref_cfg = dataclasses.replace(cfg, vit_fused_attn="auto")
        ref = R3MEncoder(ref_cfg, state["params"], state["batch_stats"])
        e_ref = np.asarray(ref._fwd(ref.params, ref.batch_stats, obs_dev))
        e_fast = np.asarray(out)
        num = np.sum(e_ref * e_fast, axis=-1)
        den = np.maximum(
            np.linalg.norm(e_ref, axis=-1) * np.linalg.norm(e_fast, axis=-1),
            1e-12,
        )
        print(
            f"[bench] fast-vs-parity embedding cosine: min {np.min(num / den):.7f}"
        )

    # 2) delivered: the public __call__ law from host memory (uint8 NCHW).
    for _ in range(3):
        out = enc(obs)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = enc(obs)
    _sync(out)
    fps = bs * steps / (time.perf_counter() - t0)
    result = {
        "metric": (
            f"r3m_serving_size{size}_delivered_frames_per_sec"
            + ("_fast" if precision == "fast" else "")
        ),
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / A100_BASELINE_FPS, 4),
    }
    if size == 0:
        result["vit_fused"] = str(cfg.vit_fused_attn)
    print(json.dumps(result))


def main():
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
        # ViT-only lever (ops/attention.py); measured in BASELINE.md.
        # auto = config default (train -> batched kernel), 0 = einsum,
        # 1 = unrolled kernel, batched = the 3-D-dot kernel variant
        vit_fused_attn=_parse_fused(os.environ.get("BENCH_VIT_FUSED", "auto")),
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
    result = {
        "metric": (
            "r3m_pretrain_resnet50_frames_per_sec_per_chip"
            if size == 50
            else f"r3m_pretrain_size{size}_frames_per_sec_per_chip"
        ),
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / A100_BASELINE_FPS, 4),
    }
    if size == 0:
        # Tag the attention lowering so battery logs that sweep
        # BENCH_VIT_FUSED stay attributable (auto resolves per
        # R3MConfig.resolved_fused_attn — "batched" for this train step).
        result["vit_fused"] = str(cfg.vit_fused_attn)
    print(json.dumps(result))


def _setup_compilation_cache():
    # persist compiled executables across runs (first TPU compile is ~20-40s)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(os.environ.get("BENCH_CACHE", "~/.cache/r3m_tpu_xla")),
    )


def _arm_watchdog():
    """Turn a dead-tunnel hang into a clean failure.

    A healthy run (cold compile included) finishes in well under the
    default window, but when the tunneled TPU link is down the first
    device op blocks forever with no exception — which would hang any
    unbounded caller. BENCH_WATCHDOG=0 disables.
    """
    import threading

    limit = float(os.environ.get("BENCH_WATCHDOG", "1800"))
    if limit <= 0:
        return

    def _fire():
        import sys

        print(
            f"[bench] FATAL: no result after {limit:.0f}s — the TPU backend "
            "is unresponsive (tunnel down?); aborting instead of hanging",
            file=sys.stderr,
            flush=True,
        )
        os._exit(3)

    t = threading.Timer(limit, _fire)
    t.daemon = True
    t.start()


if __name__ == "__main__":
    _setup_compilation_cache()
    _arm_watchdog()
    # the tunneled-TPU backend occasionally fails to initialize transiently;
    # retry before giving up so a hiccup doesn't read as a benchmark failure
    for attempt in range(3):
        try:
            if os.environ.get("BENCH_DATA"):
                main_data()
            elif os.environ.get("BENCH_EVAL"):
                main_eval()
            else:
                main()
            break
        except Exception as e:
            if attempt == 2:
                raise
            print(f"[bench] retrying after {type(e).__name__}: {e}")
            time.sleep(10)
