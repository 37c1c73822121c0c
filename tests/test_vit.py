"""ViT-B/32-JAX parity vs HuggingFace torch ViTModel (random init).

The reference's size==0 branch targets HF `google/vit-base-patch32-224-in21k`
(models_r3m.py:52-56). Offline environment => parity is checked against a
from-config randomly initialized HF ViTModel, which exercises the identical
architecture + numerics paths.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from r3m_tpu.models.vit import ViTConfig, convert_vit, vit_b32_apply
import pytest

SMALL = ViTConfig(
    image_size=32, patch_size=16, dim=32, n_layers=2, n_heads=4, hidden_dim=64
)


def _hf_model(cfg):
    from transformers import ViTConfig as HFConfig, ViTModel

    hf_cfg = HFConfig(
        hidden_size=cfg.dim,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads,
        intermediate_size=cfg.hidden_dim,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    return ViTModel(hf_cfg, add_pooling_layer=True).eval()


def test_pooler_output_parity(rng):
    tm = _hf_model(SMALL)
    params = convert_vit(tm.state_dict(), SMALL)

    imgs = rng.normal(size=(2, SMALL.image_size, SMALL.image_size, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).pooler_output.numpy()

    ours = vit_b32_apply(
        params, jnp.asarray(imgs), SMALL, precision=jax.lax.Precision.HIGHEST
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_r3m_embed_vit_shape():
    """R3MConfig(size=0) end-to-end: [B,224,224,3] in [0,255] -> [B, 768]."""
    from r3m_tpu.models.r3m import R3MConfig, r3m_embed, r3m_init

    cfg = R3MConfig(size=0)
    assert cfg.out_dim == 768
    state = r3m_init(jax.random.PRNGKey(0), cfg)
    obs = jnp.zeros((2, 224, 224, 3), jnp.float32)
    emb, stats = r3m_embed(cfg, state["params"], state["batch_stats"], obs)
    assert emb.shape == (2, 768)
    assert stats == {}  # no BN state in ViT


@pytest.mark.slow
def test_vit_train_step_runs():
    """One jitted TCN train step with the ViT backbone (tiny batch)."""
    from r3m_tpu.models.r3m import R3MConfig
    from r3m_tpu.training.trainer import create_train_state, make_train_step

    cfg = R3MConfig(size=0, langweight=0.0, tcnweight=1.0)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = {
        "images": jnp.zeros((2, 5, 224, 224, 3), jnp.float32) + 127.0,
    }
    step = make_train_step(cfg, doaug="none", donate=False)
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["full_loss"]))


@pytest.mark.slow
def test_vit_honors_image_size_knob():
    """size=0 with a non-224 image_size must build a matching pos table."""
    import pytest

    from r3m_tpu.models.r3m import R3MConfig, r3m_embed, r3m_init

    cfg = R3MConfig(size=0, langweight=0.0, image_size=64)
    state = r3m_init(jax.random.PRNGKey(0), cfg)
    assert state["params"]["convnet"]["pos"].shape == (1, 2 * 2 + 1, 768)
    obs = jnp.zeros((2, 64, 64, 3))
    emb, _ = r3m_embed(cfg, state["params"], state["batch_stats"], obs)
    assert emb.shape == (2, 768)

    with pytest.raises(ValueError, match="divisible"):
        r3m_init(jax.random.PRNGKey(0), R3MConfig(size=0, image_size=50))


def test_vit_export_convert_roundtrip():
    """export_vit emits exactly the HF ViTModel state-dict naming: a strict
    torch load of the exported dict succeeds and reproduces the weights."""
    tm = _hf_model(SMALL)
    params = convert_vit(tm.state_dict(), SMALL)

    from r3m_tpu.models.vit import export_vit

    sd = export_vit(params)
    tm2 = _hf_model(SMALL)
    tm2.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    for k, v in tm.state_dict().items():
        np.testing.assert_allclose(
            tm2.state_dict()[k].numpy(), v.numpy(), rtol=0, atol=0, err_msg=k
        )


def test_vit_config_from_state():
    """Architecture shape fields are recovered from a state dict (n_heads is
    not shape-determined and follows the HF dim/64 family rule instead)."""
    from r3m_tpu.models.vit import vit_config_from_state

    got = vit_config_from_state(_hf_model(SMALL).state_dict())
    assert (got.image_size, got.patch_size, got.dim, got.n_layers, got.hidden_dim) == (
        SMALL.image_size,
        SMALL.patch_size,
        SMALL.dim,
        SMALL.n_layers,
        SMALL.hidden_dim,
    )


@pytest.mark.slow
def test_reference_vit_snapshot_roundtrip(tmp_path):
    """A size==0 model exported to the reference's torch snapshot format
    loads back through `load_r3m_from_files` with identical embeddings —
    the ViT counterpart of the resnet checkpoint round-trip."""
    from types import SimpleNamespace

    from r3m_tpu import load_r3m_from_files
    from r3m_tpu.checkpoint import export_torch_snapshot
    from r3m_tpu.models.r3m import R3MConfig, r3m_embed, r3m_init

    cfg = R3MConfig(size=0, langweight=0.0, image_size=64)
    state = r3m_init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "snapshot.pt")
    export_torch_snapshot(
        path,
        SimpleNamespace(
            params=state["params"], batch_stats=state["batch_stats"], step=np.int32(7)
        ),
        size=0,
    )

    enc = load_r3m_from_files(path)
    assert enc.cfg.size == 0
    assert enc.cfg.image_size == 64  # inferred from the pos-embedding table
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 255, size=(2, 3, 64, 64)).astype(np.float32)
    got = np.asarray(enc(imgs))

    direct, _ = r3m_embed(
        cfg,
        state["params"],
        state["batch_stats"],
        jnp.asarray(imgs.transpose(0, 2, 3, 1)),
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(got, np.asarray(direct), rtol=1e-5, atol=1e-5)


def test_convert_rejects_non_b32_vit():
    """Reference-artifact conversion only serves ViT-B/32; other geometries
    must fail loudly at convert time, not with a shape error at forward."""
    from r3m_tpu.convert import convert_r3m_torch_state

    sd = {
        f"module.convnet.{k}": v for k, v in _hf_model(SMALL).state_dict().items()
    }
    with pytest.raises(ValueError, match="ViT-B/32"):
        convert_r3m_torch_state(sd)


def test_remat_knob_rejected_on_vit():
    """remat is a ResNet-only memory lever; silently ignoring it on ViT
    would no-op a user's config (R3MConfig.__post_init__ guard)."""
    from r3m_tpu.models.r3m import R3MConfig

    with pytest.raises(ValueError, match="remat"):
        R3MConfig(size=0, remat="conv_saved")
    R3MConfig(size=0)  # default remat fine
