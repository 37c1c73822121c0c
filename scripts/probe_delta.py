#!/usr/bin/env python
"""Pretrain -> probe-delta artifact: does R3M training help downstream?

The reference's entire point is a reusable representation evaluated
downstream (``/root/reference/README.md:36-38`` — the out-of-repo BC eval
branch; paper §4). This script is the one-command in-repo version of that
evidence (VERDICT round-4 item 1): pretrain the README config on the
synthetic reach world (``r3m_tpu.evalsuite.fixtures``), then score THREE
encoders on a held-out probe set —

  random   : fresh random init (a different seed),
  step0    : the training run's step-0 snapshot (controls for init/seed),
  trained  : the final snapshot,

with (a) a ZERO-SHOT reward-ordering metric (is −L2 similarity to the goal
frame monotone in time on held-out videos — the model's own `sim`/reward
semantics, no probe head fitted), (b) the BC probe (frozen standardized
embeddings -> reach action, split by video), and (c) closed-form linear
probes on the world's ground-truth latents (block position, goal position,
progress).  Every fitted metric is reported mean±std over 3 video-holdout
splits, and the random baseline averages 3 independent inits — single-seed
luck cannot masquerade as signal.  *Done* = trained ≫ random/step0 on the
probe metrics; results go to ``$RUN/PROBE_DELTA.json`` and a BASELINE.md
table.

Usage:
  python scripts/probe_delta.py --run /tmp/r3m_probe_r5 --steps 2000
  python scripts/probe_delta.py --run ... --skip-train   # probe-only rerun
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ensure_fixture(run: str, args) -> None:
    from r3m_tpu.evalsuite.fixtures import write_probe_dataset

    data = os.path.join(run, "data")
    if not os.path.exists(os.path.join(data, "manifest.csv")):
        print(f"[probe] rendering pretraining split -> {data}")
        write_probe_dataset(
            data, n_videos=args.videos, n_frames=args.frames,
            size=args.image_size, seed=3,
        )
    bert = os.path.join(run, "bert.npz")
    if not os.path.exists(bert):
        # random-init frozen DistilBERT: the published weights need egress
        # (prepare_language.py); a random frozen encoder still maps the 8
        # direction captions to distinct fixed embeddings, which is all the
        # language-reward alignment loss needs on this fixture.
        import jax

        from r3m_tpu.checkpoint import save_snapshot
        from r3m_tpu.models.distilbert import distilbert_init

        save_snapshot(bert, distilbert_init(jax.random.PRNGKey(9)))


def _train(run: str, args) -> None:
    from r3m_tpu.training.workspace import Workspace
    from r3m_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(
            os.path.dirname(__file__), "..", "cfgs", "config_rep.yaml"
        ),
        overrides=[
            f"datapath={os.path.join(run, 'data')}",
            f"log_dir={run}",
            f"batch_size={args.bs}",
            f"train_steps={args.steps}",
            f"eval_freq={max(100, args.steps // 4)}",
            "eval_batches=2",
            "keep_snapshots=2",
            f"num_workers={args.workers}",
            # the README train command's hyperparameters (README.md:32)
            f"agent.size={args.size}",
            "agent.langweight=1.0",
            "agent.l1weight=1e-5",
            "lr=1e-4",
            f"doaug={args.doaug}",
            f"bert_weights={os.path.join(run, 'bert.npz')}",
            f"vocab_path={os.path.join(run, 'data', 'vocab.txt')}",
        ]
        + (
            # CPU smoke runs shrink the world; the chip artifact stays 224
            [f"+agent.image_size={args.image_size}"]
            if args.image_size != 224
            else []
        ),
    )
    ws = Workspace(cfg, work_dir=run)
    try:
        if ws.global_step == 0:
            # step-0 control snapshot (same init/seed as the run), kept
            # under a name the retention pruner ignores
            ws.save_snapshot()
            ws.flush_snapshots()
            shutil.copyfile(
                os.path.join(run, "snapshot_0.npz"),
                os.path.join(run, "init_snapshot.npz"),
            )
        ws.train()
        print(f"[probe] trained to step {ws.global_step}")
    finally:
        ws.close()


def _embed(enc, images: np.ndarray, chunk: int = 120) -> np.ndarray:
    from r3m_tpu.evalsuite.bc import _embed_chunked

    return _embed_chunked(enc, images, chunk)


def _metrics_for_split(emb: np.ndarray, probe: dict, seed: int) -> dict:
    """One video-held-out split: standardized BC probe + linear probes."""
    import jax.numpy as jnp

    from r3m_tpu.evalsuite.bc import bc_probe
    from r3m_tpu.evalsuite.fixtures import linear_probe

    video = probe["video"]
    ids = np.unique(video)
    rng = np.random.default_rng(seed)
    rng.shuffle(ids)
    val_ids = ids[: max(1, len(ids) // 4)]
    val_mask = np.isin(video, val_ids)

    # Center + SCALAR-scale embeddings on TRAIN-split statistics before the
    # BC head: encoders differ wildly in feature scale (the L1 penalty vs a
    # fresh init), and a fixed-lr Adam MLP is not scale-invariant — without
    # this the BC column confounds representation quality with feature norm.
    # Deliberately ONE scalar, not per-dim whitening: per-dim sd amplifies
    # dims that are near-constant on the train videos but vary on held-out
    # videos (sd -> eps floor, z -> 1e6; observed as a 2.5e6 val MSE on the
    # random baseline). (linear_probe ridge-standardizes internally, where
    # the per-dim form is safe because the penalty bounds the weights.)
    mu = emb[~val_mask].mean(0)
    s = float(emb[~val_mask].std()) + 1e-8
    z = (emb - mu) / s

    # BC probe trained on train videos; evaluated on HELD-OUT videos
    # (frame-level splits leak: adjacent frames are near-duplicates)
    res = bc_probe(
        embed_fn=lambda x: x,  # embeddings precomputed above
        images=z[~val_mask],
        actions=probe["actions"][~val_mask],
        steps=400,
        val_frac=0.1,
        seed=seed,
    )
    pred = np.asarray(
        res["policy_apply"](res["policy_params"], jnp.asarray(z[val_mask]))
    )
    bc_mse = float(np.mean((pred - probe["actions"][val_mask]) ** 2))
    # direction accuracy: does the policy at least point the right way?
    # Goal frames carry the exact zero action (render_probe_set's
    # norm<=1e-6 branch): dot = 0 for ANY prediction, so they have no
    # direction to score — mask them out of the denominator instead of
    # counting them as misses for every encoder (review finding: they
    # uniformly deflated the recorded round-5 accuracies by ~1/n_frames).
    acts = probe["actions"][val_mask]
    has_dir = np.linalg.norm(acts, axis=-1) > 1e-6
    dots = np.sum(pred * acts, axis=-1)
    bc_dir_acc = float(np.mean(dots[has_dir] > 0))

    return {
        "bc_val_mse": bc_mse,
        "bc_dir_acc": bc_dir_acc,
        "block_pos_r2": linear_probe(
            emb, probe["latents"][:, :2], groups=video, seed=seed
        )["r2_mean"],
        "goal_pos_r2": linear_probe(
            emb, probe["latents"][:, 2:4], groups=video, seed=seed
        )["r2_mean"],
        "progress_r2": linear_probe(
            emb, probe["progress"], groups=video, seed=seed
        )["r2_mean"],
    }


METRICS = (
    "bc_val_mse", "bc_dir_acc", "block_pos_r2", "goal_pos_r2",
    "progress_r2",
)


def _add_caption_contrast(rows, run, snap_path, snap_meta, probe) -> None:
    """Zero-shot language-reward discrimination (fixtures.
    caption_contrast_acc): does the TRAINED reward head pick the true
    direction caption out of all 8 for held-out (first, last) frame
    pairs? Chance 1/8; evidences the LANGUAGE loss specifically (the
    reference's get_reward-as-RL-reward deployment, paper §4.3).
    Skipped (with a note) when the run has no language head."""
    import jax

    from r3m_tpu.evalsuite.fixtures import caption_contrast_acc

    try:
        from r3m_tpu.checkpoint import r3m_config_from_meta
        from r3m_tpu.models.r3m import r3m_init
        from r3m_tpu.reward import R3MRewardModel
        from r3m_tpu.text.tokenizer import WordPieceTokenizer
        from r3m_tpu.training.workspace import load_bert_params

        bert = os.path.join(run, "bert.npz")
        vocab = os.path.join(run, "data", "vocab.txt")
        video = probe["video"]
        vids = np.unique(video)
        first = np.asarray([np.nonzero(video == v)[0][0] for v in vids])
        last = np.asarray([np.nonzero(video == v)[0][-1] for v in vids])
        deltas = (
            probe["latents"][first, 2:4] - probe["latents"][first, :2]
        )
        imgs_first, imgs_last = probe["images"][first], probe["images"][last]

        def acc_of(rm) -> float:
            e0 = np.asarray(rm.embed(imgs_first))
            et = np.asarray(rm.embed(imgs_last))
            return caption_contrast_acc(rm.get_reward, e0, et, deltas)

        # fully random models (encoder + reward head + the same frozen
        # BERT): the chance-level baseline, averaged over 3 seeds
        full_cfg = r3m_config_from_meta(snap_meta, compute_dtype="float32")
        bert_params, bert_cfg = load_bert_params(bert)
        tok = WordPieceTokenizer(vocab_file=vocab)
        lml = int(snap_meta.get("lang_max_len", 32))
        rnd_accs = []
        for k in (4242, 4243, 4244):
            s = r3m_init(jax.random.PRNGKey(k), full_cfg)
            rnd_accs.append(
                acc_of(
                    R3MRewardModel(
                        full_cfg, s["params"], s["batch_stats"],
                        bert_params, tok, lang_max_len=lml,
                        bert_cfg=bert_cfg,
                    )
                )
            )
        accs = {
            "random_init(x3)": (
                float(np.mean(rnd_accs)), float(np.std(rnd_accs))
            ),
            "step0_snapshot": (
                acc_of(R3MRewardModel.from_snapshot(
                    os.path.join(run, "init_snapshot.npz"), bert, vocab
                )),
                0.0,
            ),
            "trained": (
                acc_of(R3MRewardModel.from_snapshot(snap_path, bert, vocab)),
                0.0,
            ),
        }
    except (ValueError, FileNotFoundError, KeyError) as e:
        print(f"[probe] lang caption-contrast skipped: {e}")
        return
    for r in rows:
        if r["encoder"] in accs:
            m, s = accs[r["encoder"]]
            r["lang_contrast_acc"] = m
            r["lang_contrast_acc_std"] = s
            print(
                f"[probe] lang_contrast_acc[{r['encoder']}] = "
                f"{m:.3f}±{s:.3f} (chance 0.125)"
            )


def _probe_encoder(
    name: str, encs, probe, split_seeds=(0, 1, 2)
) -> dict:
    """Score one encoder variant (or a LIST of same-role encoders, e.g.
    several random inits) over several video-holdout splits; report
    mean ± std over every (encoder, split) sample so single-seed luck —
    the round-4 run's failure mode — cannot masquerade as signal."""
    from r3m_tpu.evalsuite.fixtures import reward_order_acc

    if not isinstance(encs, (list, tuple)):
        encs = [encs]
    samples: list = []
    order_accs = []
    for enc in encs:
        emb = _embed(enc, probe["images"])
        order_accs.append(reward_order_acc(emb, probe["video"]))
        for s in split_seeds:
            samples.append(_metrics_for_split(emb, probe, s))
    out = {"encoder": name, "n_samples": len(samples)}
    for m in METRICS:
        vals = np.asarray([r[m] for r in samples])
        out[m] = float(vals.mean())
        out[m + "_std"] = float(vals.std())
    out["reward_order_acc"] = float(np.mean(order_accs))
    out["reward_order_acc_std"] = float(np.std(order_accs))
    print("[probe]", json.dumps(out))
    return out


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run", default="/tmp/r3m_probe_r5")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--size", type=int, default=50)
    p.add_argument("--videos", type=int, default=64)
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--probe-videos", type=int, default=48)
    p.add_argument("--probe-frames", type=int, default=30)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument(
        "--doaug", default="rctraj",
        help="augmentation mode (README default rctraj; 'none' is the "
        "crop-invariance ablation: absolute-position probes should recover "
        "when the objective stops training invariance to spatial crops)",
    )
    p.add_argument("--skip-train", action="store_true")
    args = p.parse_args()

    from r3m_tpu.utils.misc import honor_jax_platforms_env

    honor_jax_platforms_env()  # JAX_PLATFORMS=cpu smoke runs really run on cpu

    import jax

    from r3m_tpu import load_r3m_from_snapshot
    from r3m_tpu.evalsuite.fixtures import render_probe_set
    from r3m_tpu.models.r3m import R3MEncoder, r3m_init

    run = args.run
    os.makedirs(run, exist_ok=True)
    _ensure_fixture(run, args)
    if not args.skip_train:
        _train(run, args)

    cache = os.path.join(
        run,
        f"probe_set_{args.probe_videos}x{args.probe_frames}"
        f"_{args.image_size}.npz",
    )
    if os.path.exists(cache):
        print(f"[probe] loading cached probe set {cache}")
        probe = dict(np.load(cache))
    else:
        print("[probe] rendering held-out probe set")
        probe = render_probe_set(
            n_videos=args.probe_videos, n_frames=args.probe_frames,
            size=args.image_size,
            seed=10_000,  # disjoint from the training split's seed
        )
        np.savez(cache, **probe)  # rendering 224px sets takes minutes

    snap_path = os.path.join(run, "snapshot.npz")
    trained = load_r3m_from_snapshot(snap_path)
    step0 = load_r3m_from_snapshot(os.path.join(run, "init_snapshot.npz"))
    # the rolling snapshot is the LAST EVAL-EVENT snapshot, which for
    # eval_freq = steps//4 lands at ~3/4 of the run (training stops before
    # the next event) — record the step actually scored, not the nominal
    # --steps, so the artifact is honest about what "trained" means
    # (npz members load lazily, so this reads only the meta blob)
    with np.load(snap_path) as z:
        snap_meta = json.loads(bytes(z["__meta__"]).decode())
    scored_step = int(snap_meta.get("global_step", -1))
    rnds = [
        R3MEncoder(
            trained.cfg,
            *(lambda s: (s["params"], s["batch_stats"]))(
                r3m_init(jax.random.PRNGKey(k), trained.cfg)
            ),
        )
        for k in (4242, 4243, 4244)
    ]

    rows = [
        _probe_encoder("random_init(x3)", rnds, probe),
        _probe_encoder("step0_snapshot", step0, probe),
        _probe_encoder("trained", trained, probe),
    ]
    _add_caption_contrast(rows, run, snap_path, snap_meta, probe)
    result = {
        "steps": args.steps,
        "scored_snapshot_step": scored_step,
        "doaug": args.doaug,
        "size": args.size,
        "probe_frames": int(probe["images"].shape[0]),
        "rows": rows,
    }
    out_path = os.path.join(run, "PROBE_DELTA.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"[probe] wrote {out_path}")

    # markdown table for BASELINE.md (mean ± std over (init, split) samples)
    def cell(r, m, prec=3):
        return f"{r[m]:.{prec}f}±{r[m + '_std']:.{prec}f}"

    has_lang = all("lang_contrast_acc" in r for r in rows)
    lang_hdr = " lang caption contrast (zero-shot, chance 0.125) |" if has_lang else ""
    print("\n| encoder | reward-order acc (zero-shot) |" + lang_hdr +
          " BC val MSE (held-out videos) | BC dir acc | "
          "block-pos R2 | goal-pos R2 | progress R2 |")
    print("|---|---|" + ("---|" if has_lang else "") + "---|---|---|---|---|")
    for r in rows:
        lang_cell = f" {cell(r, 'lang_contrast_acc')} |" if has_lang else ""
        print(
            f"| {r['encoder']} | {cell(r, 'reward_order_acc')} |" + lang_cell +
            f" {cell(r, 'bc_val_mse', 4)} | {cell(r, 'bc_dir_acc')} | "
            f"{cell(r, 'block_pos_r2')} | {cell(r, 'goal_pos_r2')} | "
            f"{cell(r, 'progress_r2')} |"
        )

    tr, rnd = rows[2], rows[0]
    print(
        json.dumps(
            {
                "metric": "probe_delta_reward_order_acc_trained_minus_random",
                "value": round(
                    tr["reward_order_acc"] - rnd["reward_order_acc"], 4
                ),
                "unit": "accuracy delta (>0 = trained better)",
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "probe_delta_bc_mse_ratio_trained_vs_random",
                "value": round(
                    tr["bc_val_mse"] / max(rnd["bc_val_mse"], 1e-9), 4
                ),
                "unit": "ratio (<1 = trained better)",
            }
        )
    )
    if "lang_contrast_acc" in tr:
        print(
            json.dumps(
                {
                    "metric": "probe_delta_lang_contrast_acc_trained",
                    "value": round(tr["lang_contrast_acc"], 4),
                    "unit": "8-way caption accuracy (chance 0.125)",
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
