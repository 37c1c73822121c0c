"""ResNet numerics parity vs a PyTorch oracle (torchvision-compatible)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from r3m_tpu.convert import convert_resnet, detect_resnet_size, strip_prefix
from r3m_tpu.models.resnet import (
    batch_norm,
    bn_init,
    max_pool_3x3s2,
    resnet_apply,
    resnet_init,
    resnet_out_dim,
)
from tests.torch_ref import torch_resnet


def _to_jax_nhwc(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _manifest(size: int) -> dict:
    """Vendored torchvision state-dict layout (key -> shape); fc.* dropped
    because R3M replaces fc with Identity (models_r3m.py:62) and so do both
    the oracle and the exporter. scripts/gen_tv_manifest.py documents the
    provenance (regenerates from real torchvision when importable)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(__file__), "data", "torchvision_resnet_manifest.json"
    )
    with open(path) as f:
        m = json.load(f)[str(size)]
    return {k: tuple(v) for k, v in m.items() if not k.startswith("fc.")}


@pytest.mark.parametrize("size", [18, 34, 50])
def test_oracle_matches_torchvision_manifest(size):
    """The hand-rolled torch oracle must produce torchvision's exact
    state-dict key/shape set — a systematic oracle divergence from the real
    torchvision layout cannot hide behind oracle-vs-oracle parity tests."""
    sd = torch_resnet(size).state_dict()
    got = {k: tuple(v.shape) for k, v in sd.items()}
    assert got == _manifest(size)


@pytest.mark.parametrize("size", [18, 34, 50])
def test_export_matches_torchvision_manifest(size):
    """export_resnet must emit exactly the torchvision layout (the format
    the reference's published snapshots use, r3m/__init__.py:73), and
    convert_resnet must round-trip it."""
    from r3m_tpu.convert import export_resnet
    from r3m_tpu.models.resnet import resnet_init

    manifest = _manifest(size)
    params, state = resnet_init(jax.random.PRNGKey(0), size)
    sd = export_resnet(params, state, size)
    assert {k: tuple(np.shape(v)) for k, v in sd.items()} == manifest

    # and the converter consumes exactly that layout back to pytrees
    p2, s2 = convert_resnet(sd, size)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path((params, state)),
        jax.tree_util.tree_leaves_with_path((p2, s2)),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("size", [18, 34, 50])
def test_eval_parity_vs_real_torchvision(size, rng):
    """Identical to test_eval_parity_vs_torch but against GENUINE
    torchvision (auto-upgrades when the environment gains it; skipped
    offline). Keeps the pinned hand-rolled tier's numerics untouched."""
    pytest.importorskip("torchvision")
    from r3m_tpu.torch_oracle import torch_resnet as tv_resnet

    tm = tv_resnet(size, prefer_torchvision=True).eval()
    assert type(tm).__module__.startswith("torchvision")
    _assert_eval_parity(tm, size, rng)


@pytest.mark.parametrize("size", [18, 34, 50])
def test_eval_parity_vs_torch(size, rng):
    tm = torch_resnet(size).eval()
    _assert_eval_parity(tm, size, rng)


def _assert_eval_parity(tm, size, rng):
    # randomize running stats so eval-mode BN is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    params, state = convert_resnet(tm.state_dict(), size)

    x = rng.standard_normal((2, 3, 64, 64), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    out, _ = resnet_apply(params, state, _to_jax_nhwc(x), size=size, train=False)
    out = np.asarray(out)

    assert out.shape == (2, resnet_out_dim(size))
    cos = np.sum(ref * out, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1)
    )
    assert np.all(cos > 0.9999), cos
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_train_mode_bn_parity(rng):
    """Train-mode BN: batch-stat normalization + running-stat updates match torch."""
    tm = torch.nn.BatchNorm2d(8)
    with torch.no_grad():
        tm.weight.uniform_(0.5, 1.5)
        tm.bias.uniform_(-0.5, 0.5)
    tm.train()

    x = rng.standard_normal((4, 8, 6, 6), dtype=np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()

    params = {"scale": jnp.asarray(tm.weight.detach().numpy()),
              "bias": jnp.asarray(tm.bias.detach().numpy())}
    _, state = bn_init(8)
    y, new_state = batch_norm(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), params, state, train=True
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_state["mean"]), tm.running_mean.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state["var"]), tm.running_var.numpy(), rtol=1e-4, atol=1e-5
    )


def test_max_pool_matches_torch(rng):
    x = rng.standard_normal((2, 5, 13, 13), dtype=np.float32)
    ref = torch.nn.functional.max_pool2d(
        torch.from_numpy(x), 3, stride=2, padding=1
    ).numpy()
    out = max_pool_3x3s2(jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, rtol=1e-6, atol=1e-6
    )


def test_converter_handles_module_prefix():
    tm = torch_resnet(18)
    sd = {f"module.convnet.{k}": v for k, v in tm.state_dict().items()}
    sd = strip_prefix(sd)
    assert detect_resnet_size(sd, prefix="convnet.") == 18
    params, state = convert_resnet(sd, 18, prefix="convnet.")
    assert params["conv1"]["w"].shape == (7, 7, 3, 64)
    assert state["bn1"]["mean"].shape == (64,)


@pytest.mark.slow
def test_init_shapes_and_grad():
    params, state = resnet_init(jax.random.PRNGKey(0), 18)

    def loss_fn(p):
        out, _ = resnet_apply(
            p, state, jnp.ones((1, 32, 32, 3)), size=18, train=False
        )
        return jnp.sum(out**2)

    g = jax.grad(loss_fn)(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0
    )
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


@pytest.mark.parametrize("size", [18, 50])
def test_bn_folding_parity(size, rng):
    """Folded inference forward == conv->BN(eval) forward (serving path)."""
    import jax

    from r3m_tpu.models.resnet import (
        fold_batchnorm,
        resnet_apply,
        resnet_apply_folded,
        resnet_init,
    )

    key = jax.random.PRNGKey(3)
    params, state = resnet_init(key, size)
    # non-trivial BN statistics
    state = jax.tree_util.tree_map(
        lambda x: x + jnp.abs(jax.random.normal(key, x.shape)) * 0.1, state
    )
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    ref, _ = resnet_apply(
        params, state, x, size=size, train=False,
        precision=jax.lax.Precision.HIGHEST,
    )
    folded = fold_batchnorm(params, state, size)
    out = resnet_apply_folded(
        folded, x, size=size, precision=jax.lax.Precision.HIGHEST
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_encoder_refolds_on_weight_swap(rng):
    """Swapping enc.params['convnet'] (torch-style) must not serve stale
    folded weights (regression: id()-based staleness check missed it)."""
    import jax

    from r3m_tpu.models.r3m import R3MConfig, R3MEncoder, r3m_init

    cfg = R3MConfig(size=18)
    s1 = r3m_init(jax.random.PRNGKey(0), cfg)
    s2 = r3m_init(jax.random.PRNGKey(1), cfg)
    enc = R3MEncoder(cfg, s1["params"], s1["batch_stats"])
    img = rng.integers(0, 255, size=(1, 3, 64, 64)).astype(np.float32)
    e1 = np.asarray(enc(img))
    enc.params["convnet"] = s2["params"]["convnet"]  # nested swap
    e2 = np.asarray(enc(img))
    assert not np.allclose(e1, e2)


def test_conv_saved_remat_is_bit_exact(rng):
    """remat="conv_saved" (jax.checkpoint, save-only conv outs + BN stats)
    must not change the loss, gradients, or BN running-stat updates."""
    params, state = resnet_init(jax.random.PRNGKey(0), 18)
    x = jnp.asarray(rng.uniform(size=(4, 64, 64, 3)).astype(np.float32))

    def loss(p, remat):
        f, ns = resnet_apply(p, state, x, size=18, train=True, remat=remat)
        return jnp.sum(f**2), ns

    (l0, ns0), g0 = jax.value_and_grad(loss, has_aux=True)(params, "none")
    (l1, ns1), g1 = jax.value_and_grad(loss, has_aux=True)(params, "conv_saved")
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(ns0), jax.tree_util.tree_leaves(ns1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resnet_apply_rejects_unknown_remat():
    params, state = resnet_init(jax.random.PRNGKey(0), 18)
    x = jnp.zeros((1, 32, 32, 3))
    with pytest.raises(ValueError, match="remat"):
        resnet_apply(params, state, x, size=18, train=True, remat="blocks")


@pytest.mark.parametrize("size", [18, 34, 50])
def test_packed_bn_roundtrip(size):
    """pack -> unpack is the identity on both params and batch stats."""
    from r3m_tpu.models.resnet import (
        infer_resnet_size,
        is_packed,
        pack_bn_params,
        pack_bn_state,
        unpack_bn_params,
        unpack_bn_state,
    )

    params, state = resnet_init(jax.random.PRNGKey(1), size)
    # non-trivial values so mixed-up offsets can't pass
    params = jax.tree_util.tree_map(
        lambda x: x + jax.random.normal(jax.random.PRNGKey(2), x.shape), params
    )
    packed_p = pack_bn_params(params, size)
    packed_s = pack_bn_state(state, size)
    assert is_packed(packed_p) and not is_packed(params)
    assert infer_resnet_size(packed_p) == size
    back_p = unpack_bn_params(packed_p, size)
    back_s = unpack_bn_state(packed_s, size)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(back_p),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(state),
        jax.tree_util.tree_leaves_with_path(back_s),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_bn_apply_matches_canonical(rng):
    """resnet_apply on the packed layout == canonical layout (same program
    math; fusion boundaries may reorder f32 reductions — tight rtol)."""
    from r3m_tpu.models.resnet import pack_bn_params, pack_bn_state, unpack_bn_state

    size = 18
    params, state = resnet_init(jax.random.PRNGKey(0), size)
    x = jnp.asarray(rng.uniform(size=(4, 64, 64, 3)).astype(np.float32))

    ref, ref_ns = resnet_apply(params, state, x, size=size, train=True)
    out, out_ns = resnet_apply(
        pack_bn_params(params, size), pack_bn_state(state, size), x,
        size=size, train=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
    out_ns = unpack_bn_state(out_ns, size)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_ns), jax.tree_util.tree_leaves(out_ns)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_amax_pool_grads_match_reduce_window_and_torch(rng):
    """The argmax-saving maxpool VJP (kept as a measured-negative lever,
    BASELINE.md round 3) must match XLA select-and-scatter gradients AND
    torch's first-max tie semantics on tie-heavy input."""
    from r3m_tpu.models.resnet import max_pool_3x3s2_amax

    # quantized values force ties within windows
    x = (rng.integers(0, 3, size=(2, 4, 13, 13)) / 2.0).astype(np.float32)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

    def loss_rw(v):
        return jnp.sum(max_pool_3x3s2(v) ** 2)

    def loss_am(v):
        return jnp.sum(max_pool_3x3s2_amax(v) ** 2)

    np.testing.assert_array_equal(
        np.asarray(max_pool_3x3s2_amax(xj)), np.asarray(max_pool_3x3s2(xj))
    )
    g_rw = np.asarray(jax.grad(loss_rw)(xj))
    g_am = np.asarray(jax.grad(loss_am)(xj))
    np.testing.assert_array_equal(g_am, g_rw)

    xt = torch.from_numpy(x).requires_grad_(True)
    yt = torch.nn.functional.max_pool2d(xt, 3, stride=2, padding=1)
    (yt**2).sum().backward()
    np.testing.assert_allclose(
        np.transpose(g_am, (0, 3, 1, 2)), xt.grad.numpy(), rtol=1e-6, atol=1e-6
    )
