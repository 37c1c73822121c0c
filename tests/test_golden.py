"""Golden-value regression: the full train step's loss surface is pinned.

Guards the end-to-end semantics (preprocess -> encode -> TCN/L1/L2 losses
-> Adam) against silent drift. Values were produced by this code on CPU
f32 at a fixed seed; tolerances absorb XLA version-level float noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from r3m_tpu.models.r3m import R3MConfig
from r3m_tpu.training.trainer import create_train_state, make_train_step

GOLDEN_STEP1 = {
    "full_loss": 18.42531394958496,
    "tcnloss": 18.42071533203125,
    "l1loss": 430.4697265625,
    "l2loss": 29.409982681274414,
    "l0loss": 331.3000183105469,
    "aligned": 0.0,
}
GOLDEN_STEP2_LOSS_MAX = 16.5  # well below step 1: Adam actually descends
# (exact step-2 value varies ~0.5% across XLA compilation variants — the
#  optimizer amplifies float noise — so only descent is pinned)


# Per-backbone embedding pins (CPU f32, fixed seeds, deterministic input).
# These catch numerics drift in ANY backbone without needing torch — the
# external-truth check is the torch parity tier; these pin regressions
# (VERDICT round 2 item 4c). Values from this code on jax 0.9.0 CPU.
GOLDEN_EMBED = {
    "resnet34": {
        "first4": [13.606647491455078, 1.594380497932434,
                   0.6593793630599976, 11.800949096679688],
        "mean_abs": 4.414834855163463,
        "norm0": 127.26571153567058,
    },
    "resnet50": {
        "first4": [7.142032146453857, 0.6324355602264404,
                   1.5556578636169434, 11.769231796264648],
        "mean_abs": 5.325505036627874,
        "norm0": 330.20950236390166,
    },
    "vit_b32": {
        "first4": [0.3098565340042114, -0.6722264885902405,
                   -0.2570006549358368, 0.15114520490169525],
        "mean_abs": 0.37584758860270995,
        "norm0": 12.287028638454256,
    },
    "distilbert": {
        "first4": [-0.35244137048721313, 0.12024671584367752,
                   -0.19959412515163422, -0.12316539883613586],
        "mean_abs": 0.3478923266372173,
        "norm0": 12.285090211851355,
    },
}


def _assert_pins(emb, golden):
    emb = np.asarray(emb, np.float64)
    np.testing.assert_allclose(emb[0, :4], golden["first4"], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.mean(np.abs(emb)), golden["mean_abs"], rtol=2e-4)
    np.testing.assert_allclose(np.linalg.norm(emb[0]), golden["norm0"], rtol=2e-4)


@pytest.mark.parametrize("size", [34, 50])
def test_resnet_embedding_golden(size):
    from r3m_tpu.models.resnet import resnet_apply, resnet_init

    img = (jnp.arange(2 * 64 * 64 * 3, dtype=jnp.float32) % 255.0).reshape(
        2, 64, 64, 3
    )
    p, s = resnet_init(jax.random.PRNGKey(0), size)
    e, _ = resnet_apply(p, s, img / 255.0, size=size, train=False)
    _assert_pins(e, GOLDEN_EMBED[f"resnet{size}"])


@pytest.mark.slow
def test_vit_embedding_golden():
    from r3m_tpu.models.r3m import r3m_embed, r3m_init

    cfg = R3MConfig(size=0, langweight=0.0)
    st = r3m_init(jax.random.PRNGKey(0), cfg)
    obs = (jnp.arange(2 * 224 * 224 * 3, dtype=jnp.float32) % 255.0).reshape(
        2, 224, 224, 3
    )
    e, _ = r3m_embed(cfg, st["params"], st["batch_stats"], obs, train=False)
    _assert_pins(e, GOLDEN_EMBED["vit_b32"])


def test_distilbert_embedding_golden():
    from r3m_tpu.models.distilbert import BASE, distilbert_init, sentence_embedding

    bp = distilbert_init(jax.random.PRNGKey(1))
    ids = (jnp.arange(2 * 16, dtype=jnp.int32) % 1000).reshape(2, 16)
    e = sentence_embedding(bp, ids, jnp.ones((2, 16), jnp.int32), BASE)
    _assert_pins(e, GOLDEN_EMBED["distilbert"])


def test_train_step_golden_values():
    cfg = R3MConfig(
        size=18, langweight=0.0, tcnweight=1.0, l1weight=1e-5,
        l2weight=1e-5, image_size=32, compute_dtype="float32",
    )
    state = create_train_state(cfg, jax.random.PRNGKey(42))
    imgs = (jnp.arange(2 * 5 * 32 * 32 * 3, dtype=jnp.float32) % 255.0).reshape(
        2, 5, 32, 32, 3
    )
    step = make_train_step(cfg, doaug="none", donate=False)
    state2, m = step(state, {"images": imgs})
    for k, v in GOLDEN_STEP1.items():
        # l0 counts exact ReLU zeros — sensitive to vectorization width
        rtol = 5e-3 if k == "l0loss" else 2e-4
        np.testing.assert_allclose(float(m[k]), v, rtol=rtol, err_msg=k)
    _, m2 = step(state2, {"images": imgs})
    assert float(m2["full_loss"]) < GOLDEN_STEP2_LOSS_MAX
