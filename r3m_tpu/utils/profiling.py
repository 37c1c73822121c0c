"""Profiling utilities: jax.profiler traces + xprof op-time summaries.

The reference's only tracing is wall-clock bracketing of update phases
(``/root/reference/r3m/trainer.py:26-161``). The TPU-native equivalents:

* per-step host timing lives in the training loop (workspace.py);
* `trace(dir)` captures a device trace for a code region;
* `op_profile_summary(dir)` parses the captured .xplane.pb with xprof
  (when installed) into (time%, TF/s, GB/s, category) rows — the tool used
  for the roofline analysis in BASELINE.md.
"""

from __future__ import annotations

import contextlib
import glob
import json
import os
from typing import List, Tuple

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Context manager: capture a jax.profiler device trace into log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def op_profile_raw(log_dir: str, top: int = None) -> Tuple[List[Tuple], int]:
    """Parse an xplane trace into RAW per-category rows, heaviest first.

    Returns ([(time_ps, flops, bytes, occurrences, name), ...], total_time_ps)
    — the undigested xprof op-profile numbers every audit in this repo
    (BASELINE.md rooflines, scripts/project_v5p.py) derives from, so the
    tree-walk / rawBytesAccessedArray quirks live in exactly one place.
    Requires the `xprof` package (present alongside tensorboard-plugin-
    profile); raises ImportError otherwise.
    """
    from xprof.convert import raw_to_tool_data as rtd

    files = sorted(
        glob.glob(os.path.join(log_dir, "plugins/profile/*/*.xplane.pb"))
    )
    if not files:
        raise FileNotFoundError(f"no .xplane.pb under {log_dir}")
    out, _ = rtd.xspace_to_tool_data([files[-1]], "op_profile", {})
    data = json.loads(out)
    rows = []

    def walk(node, depth):
        m = node.get("metrics", {})
        if m.get("rawTime") and depth >= 2:
            rows.append(
                (
                    m["rawTime"],
                    m.get("rawFlops", 0),
                    (m.get("rawBytesAccessedArray") or [0])[0],
                    m.get("occurrences", 0),
                    node.get("name", "?"),
                )
            )
            return
        for c in node.get("children", []):
            walk(c, depth + 1)

    walk(data["byProgram"], 0)
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    return (rows[:top] if top else rows), total


def op_profile_summary(log_dir: str, top: int = 12) -> List[Tuple]:
    """Parse an xplane trace into per-category rows, heaviest first.

    Returns [(time_frac, tflops_per_s, gb_per_s, occurrences, name), ...]
    (digested from `op_profile_raw`; time is picoseconds there).
    """
    rows, total = op_profile_raw(log_dir, top)
    total = total or 1
    return [
        (
            t / total,
            fl / (t / 1e12) / 1e12 if t else 0.0,
            byt / (t / 1e12) / 1e9 if t else 0.0,
            occ,
            name,
        )
        for t, fl, byt, occ, name in rows
    ]


def print_op_profile(log_dir: str, top: int = 12) -> None:
    rows = op_profile_summary(log_dir, top)
    if not rows:
        # CPU traces carry no per-op metrics; say so instead of printing
        # nothing (an empty table reads like a parser failure).
        print(f"(no per-op metrics in trace under {log_dir} — TPU-only data)")
    for frac, tf, gb, occ, name in rows:
        print(f"{100*frac:5.1f}%  {tf:6.1f} TF/s  {gb:6.0f} GB/s  x{occ:5d}  {name}")
