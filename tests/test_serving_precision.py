"""Fast-serving precision lever: bf16 serving agrees with the parity path.

`R3MEncoder(..., precision="fast")` serves the same BN-folded weights in
bfloat16 at backend-default MXU precision (the throughput mode for reward
scoring inside RL loops); `"parity"` is the `load_r3m` law — f32/HIGHEST,
the lowering every golden pin and torch-cosine check
(`/root/reference/r3m/example.py:30-34` semantics) was taken with. These
tests pin the contract: fast output is f32, agrees with parity to bf16
rounding (cosine bound), and the kwarg threads through every loader.
"""

import dataclasses

import numpy as np
import pytest

import jax

from r3m_tpu.models.r3m import R3MConfig, R3MEncoder, r3m_init


def _cosine_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    num = np.sum(a * b, axis=-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / np.maximum(den, 1e-12)


def _encoders(cfg, seed=0):
    state = r3m_init(jax.random.PRNGKey(seed), cfg)
    parity = R3MEncoder(cfg, state["params"], state["batch_stats"])
    fast = R3MEncoder(
        cfg, state["params"], state["batch_stats"], precision="fast"
    )
    return parity, fast


@pytest.mark.parametrize("size", [18, 0])
def test_fast_matches_parity(rng, size):
    # image_size=64 keeps the CPU test cheap; ViT needs a multiple of 32
    cfg = R3MConfig(size=size, image_size=64)
    parity, fast = _encoders(cfg)
    images = rng.integers(0, 256, size=(4, 3, 64, 64)).astype(np.float32)

    e_parity = np.asarray(parity(images))
    e_fast = np.asarray(fast(images))

    assert e_fast.dtype == np.float32  # f32 at the API boundary
    assert e_fast.shape == e_parity.shape
    cos = _cosine_rows(e_fast, e_parity)
    # bf16 has ~3 decimal digits per element; over a 512/768-d embedding
    # the rounding decorrelates and the cosine stays ~1 - O(eps^2). The
    # 0.995 floor is loose on purpose (CPU bf16 emulation rounds more
    # aggressively than the MXU's f32 accumulation); real-chip readings
    # land >=0.9999 (BASELINE.md round-4 fast-serving row).
    assert np.all(cos >= 0.995), cos
    # and the norms agree to a few percent (catches dtype-scale bugs that
    # a cosine alone would miss)
    rel = np.abs(
        np.linalg.norm(e_fast, axis=-1) / np.linalg.norm(e_parity, axis=-1) - 1
    )
    assert np.all(rel < 0.05), rel


@pytest.mark.parametrize("lowering", [True, "batched"], ids=["unrolled", "batched"])
def test_fast_vit_with_fused_kernel_matches_parity(rng, lowering):
    """Fast serving + an explicit Pallas attention lowering stays on-contract.

    `vit_fused_attn="auto"` keeps SERVING on the einsum path, but fast-mode
    users can opt the bf16 forward into the kernel (the fwd-only lowerings
    measured faster than einsum at the audit shape — BASELINE.md); the
    embedding must still agree with the parity-default einsum f32 path to
    bf16 rounding. Interpret-mode here; real lowering is `pytest -m tpu`.
    """
    cfg = R3MConfig(size=0, image_size=64, vit_fused_attn=lowering)
    state = r3m_init(jax.random.PRNGKey(0), cfg)
    parity_default = R3MEncoder(
        dataclasses.replace(cfg, vit_fused_attn="auto"),
        state["params"], state["batch_stats"],
    )
    fast_kernel = R3MEncoder(
        cfg, state["params"], state["batch_stats"], precision="fast"
    )
    images = rng.integers(0, 256, size=(2, 3, 64, 64)).astype(np.float32)
    e_ref = np.asarray(parity_default(images))
    e_fast = np.asarray(fast_kernel(images))
    assert e_fast.dtype == np.float32
    assert np.all(_cosine_rows(e_fast, e_ref) >= 0.995)


def test_fast_vit_auto_resolves_to_batched_kernel():
    """'auto' serving resolution: einsum for parity, batched kernel for fast.

    Fast mode is the throughput contract, and the kernel's forward measured
    +8.2% over einsum in bf16 at identical cosine (BASELINE.md round-4
    fast-serving-attention row); parity mode must stay on the einsum
    lowering the golden pins were taken with. Explicit values pass through.
    """
    cfg = R3MConfig(size=0, image_size=64)
    state = r3m_init(jax.random.PRNGKey(0), cfg)

    def enc(cfg, precision):
        return R3MEncoder(
            cfg, state["params"], state["batch_stats"], precision=precision
        )

    assert enc(cfg, "parity").vit_serving_attn is False
    assert enc(cfg, "fast").vit_serving_attn == "batched"
    # explicit choices are never overridden
    explicit = dataclasses.replace(cfg, vit_fused_attn=True)
    assert enc(explicit, "fast").vit_serving_attn is True
    assert enc(explicit, "parity").vit_serving_attn is True
    # ResNet encoders carry no attention lowering
    rcfg = R3MConfig(size=18, image_size=64)
    rstate = r3m_init(jax.random.PRNGKey(0), rcfg)
    renc = R3MEncoder(rcfg, rstate["params"], rstate["batch_stats"])
    assert renc.vit_serving_attn is None


def test_fast_vit_kernel_survives_mesh(rng):
    """Under a multi-chip mesh, fast "auto" KEEPS the fused kernel.

    pallas_call has no GSPMD partitioning rule, so the serving forward
    wraps the kernel in `jax.shard_map` over the mesh's batch axes —
    attention is per-sample, so per-shard execution is exact. The fast
    mesh embeddings must match the single-device fast path to rounding.
    """
    from r3m_tpu.parallel.mesh import make_mesh

    cfg = R3MConfig(size=0, image_size=64)
    state = r3m_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh()
    enc = R3MEncoder(
        cfg, state["params"], state["batch_stats"], mesh=mesh,
        precision="fast",
    )
    assert enc.vit_serving_attn == "batched"  # round-5: no einsum fallback
    images = rng.integers(0, 256, size=(8, 3, 64, 64)).astype(np.float32)
    out = np.asarray(enc(images))
    assert out.shape == (8, 768) and np.all(np.isfinite(out))
    single = R3MEncoder(
        cfg, state["params"], state["batch_stats"], precision="fast"
    )
    ref = np.asarray(single(images))
    # bf16 accumulation order differs between the batch-8 single-device
    # program and the batch-1-per-shard mesh program (measured: max abs
    # diff 0.031 on norm-12 embeddings, per-sample cosine 0.9999) — pin
    # with the same cosine form the fast-vs-parity lever uses.
    cos = (out * ref).sum(1) / (
        np.linalg.norm(out, axis=1) * np.linalg.norm(ref, axis=1)
    )
    assert cos.min() >= 0.999, cos.min()
    np.testing.assert_allclose(out, ref, atol=6e-2)
    # the train/eval builders wrap the kernel over the same mesh
    from r3m_tpu.training.trainer import _attn_shard_mesh

    assert _attn_shard_mesh(cfg, mesh) is mesh
    assert _attn_shard_mesh(cfg, None) is None
    rcfg = R3MConfig(size=18, image_size=64)
    assert _attn_shard_mesh(rcfg, mesh) is None  # ResNet: no attention


def test_invalid_precision_rejected():
    cfg = R3MConfig(size=18, image_size=64)
    state = r3m_init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="parity.*fast"):
        R3MEncoder(
            cfg, state["params"], state["batch_stats"], precision="bf16"
        )


def test_parity_path_unchanged_by_lever(rng):
    """Default construction is bit-identical to explicit precision='parity'."""
    cfg = R3MConfig(size=18, image_size=64)
    state = r3m_init(jax.random.PRNGKey(0), cfg)
    default = R3MEncoder(cfg, state["params"], state["batch_stats"])
    explicit = R3MEncoder(
        cfg, state["params"], state["batch_stats"], precision="parity"
    )
    images = rng.integers(0, 256, size=(2, 3, 64, 64)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(default(images)), np.asarray(explicit(images))
    )


def test_loader_threads_precision(tmp_path, rng):
    """load_r3m_from_snapshot(precision='fast') reaches the encoder."""
    from r3m_tpu import load_r3m_from_snapshot
    from r3m_tpu.checkpoint import save_snapshot

    cfg = R3MConfig(size=18, image_size=64)
    state = r3m_init(jax.random.PRNGKey(0), cfg)
    path = tmp_path / "snap.npz"
    save_snapshot(
        str(path),
        {"params": state["params"], "batch_stats": state["batch_stats"]},
        meta={"config": dataclasses.asdict(cfg), "global_step": 0},
    )
    enc = load_r3m_from_snapshot(str(path), precision="fast")
    assert enc.precision == "fast"
    images = rng.integers(0, 256, size=(2, 3, 64, 64)).astype(np.float32)
    out = np.asarray(enc(images))
    assert out.shape == (2, 512) and out.dtype == np.float32
