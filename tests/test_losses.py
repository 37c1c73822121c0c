"""Loss-engine parity vs a torch/numpy oracle of the reference formulas.

The oracle below re-derives the reference trainer's math
(/root/reference/r3m/trainer.py:49-152) from its published formulas with
*injected* permutations, so our batched JAX implementation can be checked
term by term (the reference itself draws torch.randperm internally and is
not reproducible).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from r3m_tpu.convert import convert_language_reward
from r3m_tpu.losses import (
    draw_permutations,
    language_loss,
    lp_norms,
    r3m_loss,
    tcn_loss,
)
from r3m_tpu.models.language_reward import language_reward_apply
from r3m_tpu.models.r3m import R3MConfig, sim
from tests.torch_ref import TorchLanguageReward

EPS = 1e-8
B, D, L, H = 6, 32, 768, 64


def _np_sim(a, b, l2dist=True):
    if l2dist:
        return -np.linalg.norm(a - b, axis=-1)
    num = np.sum(a * b, -1)
    return num / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))


def _np_infonce(pos, negs_list):
    negs = np.stack(negs_list, -1)
    return -np.log(
        EPS + np.exp(pos) / (EPS + np.exp(pos) + np.exp(negs).sum(-1))
    ), negs


@pytest.fixture
def toy(rng):
    emb = rng.standard_normal((B, 5, D), dtype=np.float32) * 0.5
    lang = rng.standard_normal((B, L), dtype=np.float32) * 0.2
    return emb, lang


def _mlp_params_and_oracle(rng):
    tm = TorchLanguageReward(D, H, L)
    params = {"lang_rew": convert_language_reward(tm.state_dict(), prefix="")}
    return tm, params


def test_language_reward_mlp_parity(rng, toy):
    emb, lang = toy
    tm, params = _mlp_params_and_oracle(rng)
    e0, eg = emb[:, 0], emb[:, 1]
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(e0), torch.from_numpy(eg), torch.from_numpy(lang)
        ).numpy()
    ours = language_reward_apply(
        params["lang_rew"], jnp.asarray(e0), jnp.asarray(eg), jnp.asarray(lang)
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_language_loss_matches_oracle(rng, toy):
    emb, lang = toy
    tm, params = _mlp_params_and_oracle(rng)
    cfg = R3MConfig(size=18, langweight=1.0, num_negatives=3)
    num_neg = cfg.num_negatives

    perms = np.stack(
        [rng.permutation(B) for _ in range(num_neg * 3)]
    ).reshape(num_neg, 3, B)
    mask = np.array([1.0, 1.0, 0.0, 1.0, 1.0, 1.0], dtype=np.float32)

    # --- oracle (reference trainer.py:64-118 structure) ---
    def G(a, b):
        with torch.no_grad():
            return tm(
                torch.from_numpy(a), torch.from_numpy(b), torch.from_numpy(lang)
            ).numpy()

    e0, eg, es0, es1, es2 = (emb[:, i] for i in range(5))
    pos = [G(e0, eg), G(e0, es1), G(e0, es2)]
    negs = [[G(e0, e0)], [G(e0, es0)], [G(e0, es1)]]
    for k in range(num_neg):
        for t, second in enumerate((eg, es1, es2)):
            p = perms[k, t]
            negs[t].append(G(e0[p], second[p]))
    ref_terms, ref_negs = zip(*[_np_infonce(pos[t], negs[t]) for t in range(3)])
    ref_rewloss = float(np.mean(sum(ref_terms) / 3 * mask))
    ref_accs = [
        float(np.mean(ref_negs[t].max(-1) < pos[t])) for t in range(3)
    ]

    # --- ours ---
    loss, metrics = language_loss(
        cfg,
        params,
        *(jnp.asarray(emb[:, i]) for i in range(5)),
        jnp.asarray(lang),
        jnp.asarray(mask),
        jnp.asarray(perms),
    )
    assert np.isclose(float(loss), ref_rewloss, rtol=1e-4, atol=1e-5)
    for t in range(3):
        assert np.isclose(float(metrics[f"rewacc{t+1}"]), ref_accs[t])


@pytest.mark.parametrize("l2dist", [True, False])
def test_tcn_loss_matches_oracle(rng, toy, l2dist):
    emb, _ = toy
    cfg = R3MConfig(size=18, tcnweight=1.0, l2dist=l2dist)
    num_neg = cfg.num_negatives
    perms = np.stack(
        [rng.permutation(B) for _ in range(num_neg * 2)]
    ).reshape(num_neg, 2, B)

    es0, es1, es2 = emb[:, 2], emb[:, 3], emb[:, 4]
    s02 = _np_sim(es2, es0, l2dist)
    s12 = _np_sim(es2, es1, l2dist)
    s01 = _np_sim(es1, es0, l2dist)
    neg0 = np.stack([_np_sim(es0, es0[perms[k, 0]], l2dist) for k in range(num_neg)], -1)
    neg2 = np.stack([_np_sim(es2, es2[perms[k, 1]], l2dist) for k in range(num_neg)], -1)
    sl1 = -np.log(EPS + np.exp(s12) / (EPS + np.exp(s02) + np.exp(s12) + np.exp(neg2).sum(-1)))
    sl2 = -np.log(EPS + np.exp(s01) / (EPS + np.exp(s01) + np.exp(s02) + np.exp(neg0).sum(-1)))
    ref_loss = float(np.mean((sl1 + sl2) / 2))
    ref_aligned = float(np.mean((s02 < s12) * (s01 > s02)))

    loss, metrics = tcn_loss(
        cfg,
        jnp.asarray(es0),
        jnp.asarray(es1),
        jnp.asarray(es2),
        jnp.asarray(perms),
    )
    assert np.isclose(float(loss), ref_loss, rtol=1e-5, atol=1e-6)
    assert np.isclose(float(metrics["aligned"]), ref_aligned)


def test_lp_norms_match_torch(rng, toy):
    emb, _ = toy
    alles = emb.reshape(B * 5, D)
    t = torch.from_numpy(alles)
    refs = [
        float(torch.linalg.norm(t, ord=o, dim=-1).mean()) for o in (2, 1, 0)
    ]
    ours = [float(x) for x in lp_norms(jnp.asarray(alles))]
    np.testing.assert_allclose(ours, refs, rtol=1e-5)


@pytest.mark.slow
def test_full_loss_composition_and_jit(rng, toy):
    emb, lang = toy
    _, params = _mlp_params_and_oracle(rng)
    cfg = R3MConfig(size=18, langweight=1.0, tcnweight=1.0, l2weight=1e-5, l1weight=1e-5)
    perms = draw_permutations(jax.random.PRNGKey(0), B, cfg.num_negatives)
    mask = jnp.ones((B,))

    loss_fn = jax.jit(
        lambda p, e: r3m_loss(cfg, p, e, jnp.asarray(lang), mask, perms),
        static_argnames=(),
    )
    loss, metrics = loss_fn(params, jnp.asarray(emb))
    expected = (
        cfg.l2weight * metrics["l2loss"]
        + cfg.l1weight * metrics["l1loss"]
        + cfg.langweight * metrics["rewloss"]
        + cfg.tcnweight * metrics["tcnloss"]
    )
    assert np.isclose(float(loss), float(expected), rtol=1e-6)
    assert np.isfinite(float(loss))
    # gradient flows through the whole composition
    g = jax.grad(lambda e: r3m_loss(cfg, params, e, jnp.asarray(lang), mask, perms)[0])(
        jnp.asarray(emb)
    )
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_draw_permutations_shapes_and_validity():
    perms = draw_permutations(jax.random.PRNGKey(1), 8, 3)
    assert perms["lang"].shape == (3, 3, 8)
    assert perms["tcn"].shape == (3, 2, 8)
    for arr in (perms["lang"], perms["tcn"]):
        flat = np.asarray(arr).reshape(-1, 8)
        for row in flat:
            assert sorted(row.tolist()) == list(range(8))


def test_num_negatives_zero_supported(rng):
    """num_negatives=0 (within-video negatives only) must trace and train.

    The reference supports num_neg=0 (its negative lists still hold the
    within-video entry, trainer.py:94-99/138-141); jnp.stack over an empty
    permutation list used to raise at trace time.
    """
    from r3m_tpu.models.r3m import R3MConfig
    from r3m_tpu.models.language_reward import language_reward_init

    bs, d = 4, 16
    cfg = R3MConfig(size=18, hidden_dim=d, num_negatives=0,
                    langweight=1.0, tcnweight=1.0, lang_dim=8)
    perms = draw_permutations(jax.random.PRNGKey(0), bs, 0)
    assert perms["lang"].shape == (0, 3, bs)
    assert perms["tcn"].shape == (0, 2, bs)

    params = {"lang_rew": language_reward_init(
        jax.random.PRNGKey(1), im_dim=d, hidden_dim=16, lang_dim=8)}
    emb = jnp.asarray(rng.normal(size=(bs, 5, d)), jnp.float32)
    lang = jnp.asarray(rng.normal(size=(bs, 8)), jnp.float32)
    mask = jnp.ones((bs,), jnp.float32)
    loss, metrics = jax.jit(
        lambda e: r3m_loss(cfg, params, e, lang, mask, perms)
    )(emb)
    assert np.isfinite(float(loss))
    for k in ("rewloss", "tcnloss", "aligned"):
        assert np.isfinite(float(metrics[k]))


def test_cosine_sim_zero_embedding_no_nan():
    """torch CosineSimilarity(eps=1e-8) semantics: zero vectors give 0."""
    cfg = R3MConfig(size=18, l2dist=False)
    a = jnp.zeros((2, 8))
    b = jnp.ones((2, 8))
    s = sim(cfg, a, b)
    assert np.all(np.isfinite(np.asarray(s)))
    np.testing.assert_allclose(np.asarray(s), 0.0, atol=1e-6)


def test_cosine_sim_zero_embedding_gradient_finite():
    """Regression: the backward through the norm at an exactly-zero
    embedding must be finite (torch's 0 subgradient), not 0/0 NaN."""
    cfg = R3MConfig(size=18, l2dist=False)

    def f(a, b):
        return jnp.sum(sim(cfg, a, b))

    ga, gb = jax.grad(f, argnums=(0, 1))(jnp.zeros((2, 8)), jnp.ones((2, 8)))
    assert np.all(np.isfinite(np.asarray(ga)))
    assert np.all(np.isfinite(np.asarray(gb)))
