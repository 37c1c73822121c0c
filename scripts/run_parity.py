"""One-command parity sweep over every published reference checkpoint.

The reference's headline capability is serving the exact Google-Drive
weights (``/root/reference/r3m/__init__.py:44-113``); the north-star bar is
cosine >= 0.999 against them (BASELINE.json). This runner makes the attempt
mechanical: for each of the seven registry entries (three ``load_r3m`` ids +
four ``load_r3m_reproduce`` ablations) it fetches — or accepts pre-copied —
``~/.r3m/<folder>/{model.pt, config.yaml}`` and runs
``python -m r3m_tpu.verify_parity``, writing a combined ``PARITY.json``.

In a zero-egress environment, copy the artifacts into the cache first (any
means: rsync, a mounted volume, a proxy) and re-run; entries whose fetch
fails are recorded as skipped rather than failing the sweep.

Usage:
    python scripts/run_parity.py [--out PARITY.json] [--images 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_sweep(images: int = 8, seed: int = 0) -> dict:
    from r3m_tpu.fetch import MODEL_REGISTRY, REPRODUCE_REGISTRY, ensure_artifacts
    from r3m_tpu.verify_parity import verify_parity

    entries = [(mid, False) for mid in MODEL_REGISTRY] + [
        (mid, True) for mid in REPRODUCE_REGISTRY
    ]
    results = {}
    for modelid, reproduce in entries:
        key = f"{'reproduce:' if reproduce else ''}{modelid}"
        try:
            modelpath, configpath = ensure_artifacts(modelid, reproduce=reproduce)
        except Exception as e:  # zero egress / quota page / partial cache
            results[key] = {"skipped": True, "reason": f"{type(e).__name__}: {e}"}
            print(f"[parity] {key}: SKIPPED ({e})", file=sys.stderr)
            continue
        try:
            results[key] = verify_parity(
                modelpath, configpath, n_images=images, seed=seed
            )
        except Exception as e:  # a corrupt artifact must not kill the sweep
            results[key] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        status = results[key]
        print(f"[parity] {key}: {json.dumps(status)}")
    ran = [r for r in results.values() if not r.get("skipped")]
    return {
        "results": results,
        "attempted": len(entries),
        "ran": len(ran),
        "ok": bool(ran) and all(r.get("ok") for r in ran),
    }


def main(argv=None) -> int:
    # sitecustomize consumes JAX_PLATFORMS at interpreter start; re-apply
    # so `JAX_PLATFORMS=cpu python scripts/run_parity.py` runs on CPU.
    from r3m_tpu.utils.misc import honor_jax_platforms_env

    honor_jax_platforms_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="PARITY.json")
    p.add_argument("--images", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)
    summary = run_sweep(images=a.images, seed=a.seed)
    with open(a.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {a.out}: ran {summary['ran']}/{summary['attempted']}, "
          f"ok={summary['ok']}")
    # exit 0 when everything that RAN passed (skips are environmental);
    # exit 1 when any executed comparison failed or nothing could run —
    # a gate wired to this script must not go green on an empty sweep
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
