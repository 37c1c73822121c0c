"""Gold-standard parity: ONE full optimization step vs a torch oracle.

Reimplements the reference's update semantics in torch (encode with BN in
train mode -> L1/L2 + TCN InfoNCE with the exact epsilon placement of
trainer.py:52-59,122-150 -> backward -> torch.optim.Adam step) and checks
that our jitted pipeline — preprocess, NHWC ResNet, r3m_loss, optax Adam —
produces the same loss, the same BN running-stat updates, and the same
post-step parameters from identical weights, inputs, and negative
permutations. This catches grad/BN/optimizer divergences no forward-parity
test can see.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from r3m_tpu.convert import convert_resnet
from r3m_tpu.losses import r3m_loss
from r3m_tpu.models.r3m import R3MConfig, r3m_embed
from tests.torch_ref import torch_resnet

import pytest

pytestmark = pytest.mark.slow  # heavy integration tier; smoke runs use -m 'not slow'

EPS = 1e-8
B = 2
IMG = 64
LR = 1e-4
L1W, L2W = 1e-5, 1e-5
MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def _torch_step(tm, images, perms):
    """Reference update semantics (trainer.py:40-59,122-158) in torch."""
    opt = torch.optim.Adam(tm.parameters(), lr=LR)
    x = torch.from_numpy(images.reshape(B * 5, IMG, IMG, 3)).permute(0, 3, 1, 2)
    x = x.float() / 255.0
    x = (x - torch.tensor(MEAN)[None, :, None, None]) / torch.tensor(STD)[
        None, :, None, None
    ]
    tm.train()
    emb = tm(x).reshape(B, 5, -1)
    alles = emb.reshape(B * 5, -1)
    l2 = torch.linalg.norm(alles, dim=-1).mean()
    l1 = torch.abs(alles).sum(-1).mean()
    full = L2W * l2 + L1W * l1

    e0, eg, es0, es1, es2 = (emb[:, i] for i in range(5))

    def sim(a, b):
        return -torch.linalg.norm(a - b, dim=-1)

    sim_0_2, sim_1_2, sim_0_1 = sim(es2, es0), sim(es2, es1), sim(es1, es0)
    neg0 = torch.stack(
        [sim(es0, es0[perms[k, 0]]) for k in range(3)], dim=-1
    )
    neg2 = torch.stack(
        [sim(es2, es2[perms[k, 1]]) for k in range(3)], dim=-1
    )
    r1 = torch.exp(sim_1_2) / (
        EPS + torch.exp(sim_0_2) + torch.exp(sim_1_2) + torch.exp(neg2).sum(-1)
    )
    r2 = torch.exp(sim_0_1) / (
        EPS + torch.exp(sim_0_1) + torch.exp(sim_0_2) + torch.exp(neg0).sum(-1)
    )
    smooth = ((-torch.log(EPS + r1) - torch.log(EPS + r2)) / 2.0).mean()
    full = full + 1.0 * smooth

    opt.zero_grad()
    full.backward()
    opt.step()
    return float(full.detach()), float(smooth.detach())


def test_one_full_step_matches_torch(rng):
    # multi-threaded torch reductions are run-to-run nondeterministic, which
    # flips Adam step signs at noise-scale grads — pin threads AND the init
    # draw so the comparison is fully reproducible
    torch.set_num_threads(1)
    torch.manual_seed(0)
    tm = torch_resnet(18)
    with torch.no_grad():  # non-trivial BN stats
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.9, 1.1)

    params0, stats0 = convert_resnet(tm.state_dict(), 18, prefix="")
    images = rng.uniform(0, 255, size=(B, 5, IMG, IMG, 3)).astype(np.float32)
    perms = np.stack([rng.permutation(B) for _ in range(6)]).reshape(3, 2, B)

    # ---- ours: identical composition to the trainer's step_fn ----
    cfg = R3MConfig(
        size=18, langweight=0.0, tcnweight=1.0, l1weight=L1W, l2weight=L2W,
        image_size=IMG, compute_dtype="float32", lr=LR,
    )
    jperms = {"tcn": jnp.asarray(perms), "lang": jnp.zeros((3, 3, B), jnp.int32)}

    def loss_fn(params, stats):
        flat = jnp.reshape(jnp.asarray(images), (B * 5, IMG, IMG, 3))
        emb, new_stats = r3m_embed(
            cfg, params, stats, flat, train=True,
            precision=jax.lax.Precision.HIGHEST,
        )
        emb = jnp.reshape(emb, (B, 5, -1))
        loss, metrics = r3m_loss(cfg, params, emb, None, None, jperms)
        return loss, (metrics, new_stats)

    wrapped = {"convnet": params0}
    (loss, (metrics, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(wrapped, stats0)
    tx = optax.adam(LR, b1=0.9, b2=0.999, eps=1e-8)
    updates, _ = tx.update(grads, tx.init(wrapped), wrapped)
    new_params = optax.apply_updates(wrapped, updates)

    # ---- torch oracle (mutates tm in place) ----
    ref_loss, ref_smooth = _torch_step(tm, images, torch.from_numpy(perms))

    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4)
    np.testing.assert_allclose(float(metrics["tcnloss"]), ref_smooth, rtol=1e-4)

    # post-step params + BN stats from the mutated torch model
    ref_params, ref_stats = convert_resnet(tm.state_dict(), 18, prefix="")

    def leaves(tree):
        return jax.tree_util.tree_leaves(tree)

    for ours, ref in zip(leaves(new_params["convnet"]), leaves(ref_params)):
        # Adam's step-1 update is lr*g/(|g|+eps): where |g| is at f32-noise
        # scale the SIGN flips between frameworks, so a small fraction of
        # elements may differ by up to ~2*lr. Require (a) everything within
        # 2*lr and (b) >=99% of elements at tight tolerance.
        a, r = np.asarray(ours), np.asarray(ref)
        np.testing.assert_allclose(a, r, atol=2 * LR, rtol=1e-3)
        frac_tight = np.mean(np.abs(a - r) <= 3e-6 + 1e-4 * np.abs(r))
        assert frac_tight >= 0.98, f"only {frac_tight:.4f} within tight tol"
    for ours, ref in zip(leaves(new_stats), leaves(ref_stats)):
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=1e-5, rtol=1e-4
        )
