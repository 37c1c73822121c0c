"""Device-mesh and sharding helpers for SPMD data-parallel training.

The reference's only parallelism is single-process `torch.nn.DataParallel`
(``/root/reference/r3m/train_representation.py:30``): scatter the batch,
replicate the model, compute the loss on the gathered global batch. The
TPU-native equivalent is a 1-D ``dp`` mesh over ICI with the train step
written as a *global-batch* program under `jit`: parameters replicated,
batch sharded on axis 0, and XLA's GSPMD partitioner inserting the
all-gathers for cross-video negative shuffles and the psums for gradient
reduction. A second (outer) ``dcn`` axis can be layered for multi-slice
scale-out without touching the step function.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Pytree = Any

DATA_AXIS = "dp"
SLICE_AXIS = "dcn"  # outer axis for multi-slice (pod) scale-out over DCN


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = DATA_AXIS,
    n_slices: int = 1,
) -> Mesh:
    """Data-parallel device mesh.

    `n_slices == 1`: a 1-D ``(dp,)`` mesh over ICI (the common case).
    `n_slices > 1`: a 2-D ``(dcn, dp)`` mesh — the outer axis maps across
    pod slices (gradient psums ride DCN once per step; everything
    batch-sharded rides ICI within a slice). The train step is axis-name
    agnostic: batches shard over ALL mesh axes, params replicate.
    On multi-slice deployments pass devices ordered slice-major (JAX's
    default `jax.devices()` order) so the outer axis really is DCN.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"n_devices={n_devices} requested but only {len(devices)} "
                "visible — a silently smaller mesh would change the "
                "global-batch semantics the caller asked for"
            )
        devices = devices[:n_devices]
    devices = np.asarray(devices)
    if n_slices > 1:
        if len(devices) % n_slices:
            raise ValueError(
                f"{len(devices)} devices not divisible by n_slices={n_slices}"
            )
        return Mesh(
            devices.reshape(n_slices, -1), (SLICE_AXIS, axis_name)
        )
    return Mesh(devices, (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension across ALL mesh axes."""
    return NamedSharding(mesh, P(mesh.axis_names))


def shard_batch(mesh: Mesh, batch: Pytree) -> Pytree:
    """device_put every leaf with its batch axis split across the mesh."""
    sharding = batch_sharded(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree: Pytree) -> Pytree:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


_HLO_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "all-to-all",
    "collective-permute",
)


def collective_cost_report(hlo_text: str) -> dict:
    """Per-kind collective byte totals of an optimized (SPMD-partitioned)
    HLO module — the per-step inter-chip traffic the compiled program
    implies. Pairs with the ICI/DCN bandwidth budget in docs/DESIGN.md.

    Bytes are the collectives' result-buffer sizes per participating
    device: for `-start` forms of all-gather/collective-permute the first
    result element aliases the input and is skipped; variadic all-reduce
    tuples (XLA's grad-bucket fusion) sum every element. `-done` ops are
    skipped (they repeat the `-start` shape).
    """
    import re

    shape_re = re.compile(r"(\w+)\[([\d,]*)\]")

    def tuple_elements(t: str) -> list:
        """Split a tuple type into top-level elements (depth-aware: XLA's
        all-gather combiner emits nested tuples like
        ``((f32[128], f32[256]), (f32[1024], f32[2048]))`` whose first
        ``)`` is NOT the end of the type)."""
        t = t.strip()
        if not (t.startswith("(") and t.endswith(")")):
            return [t]
        parts, depth, cur = [], 0, []
        # commas also appear inside shape dims `[7,7,3,64]` and layout
        # annotations `{3,2,1,0}` — only depth-0 commas separate elements
        for ch in t[1:-1]:
            if ch in "([{":
                depth += 1
            elif ch in ")]}":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if cur:
            parts.append("".join(cur))
        return parts

    def elem_bytes(elem: str) -> int:
        total = 0
        for dt, dims in shape_re.findall(elem):
            if dt not in _HLO_DTYPE_BYTES:
                continue  # token[] / opaque[] etc.
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * _HLO_DTYPE_BYTES[dt]
        return total

    totals = {k: 0 for k in _COLLECTIVES}
    counts = {k: 0 for k in _COLLECTIVES}
    # non-greedy result-type capture: the type runs from '= ' to the op name
    line_re = re.compile(
        r"=\s+(.+?)\s+(%s)(-start)?\(" % "|".join(_COLLECTIVES)
    )
    for line in hlo_text.splitlines():
        m = line_re.search(line)
        if not m:
            continue
        result_type, kind, start = m.group(1), m.group(2), m.group(3)
        elements = tuple_elements(result_type)
        if (
            start
            and kind in ("all-gather", "collective-permute")
            and len(elements) > 1
        ):
            # the first tuple element aliases the input operand(s) — count
            # only the gathered/permuted outputs (+ negligible u32 contexts)
            elements = elements[1:]
        totals[kind] += sum(elem_bytes(e) for e in elements)
        counts[kind] += 1
    totals = {k: v for k, v in totals.items() if counts[k]}
    return {
        "bytes": totals,
        "ops": {k: counts[k] for k in totals},
        "total_bytes": sum(totals.values()),
    }


def place_host_batch(
    mesh: Optional[Mesh], batch: Pytree, multihost: Optional[bool] = None
) -> Pytree:
    """Place one host's batch contribution onto the device(s).

    Single-host: the host batch IS the global batch — `device_put` each leaf
    with its batch axis split across the mesh. Multi-host (`multihost=True`,
    defaulting to `jax.process_count() > 1`): the host batch is this
    process's SLICE of the global batch; `make_array_from_process_local_data`
    assembles the global jax.Array from the per-process slices, preserving
    the reference's DataParallel global-batch semantics
    (``/root/reference/r3m/train_representation.py:29-31``) across hosts.
    No mesh: plain single-device transfer.
    """
    import jax.numpy as jnp

    if mesh is None:
        return jax.tree_util.tree_map(jnp.asarray, batch)
    if multihost is None:
        multihost = jax.process_count() > 1
    if multihost:
        sharding = batch_sharded(mesh)
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch,
        )
    return shard_batch(mesh, batch)
