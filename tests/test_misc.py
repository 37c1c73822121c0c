"""Step predicates, schedule parser, and small utilities (utils.py parity)."""

import numpy as np

import jax.numpy as jnp

from r3m_tpu.utils.misc import (
    Every,
    Until,
    accuracy,
    eval_mode,
    schedule,
    soft_update_params,
)


def test_until_every():
    until = Until(5)
    assert [until(s) for s in range(7)] == [True] * 5 + [False] * 2
    assert Until(None)(10**9)
    every = Every(3)
    assert [every(s) for s in range(7)] == [True, False, False] * 2 + [True]
    assert not Every(None)(0)
    # eval_freq=0 is the usable off-switch: never fires, never divides by 0
    assert not any(Every(0)(s) for s in range(5))
    # positive every below action_repeat clamps to "every step" — a user
    # asking for FREQUENT eval must not silently get none (ADVICE round 4)
    assert all(Every(2, action_repeat=4)(s) for s in range(5))


def test_schedule_parser():
    assert schedule("0.5", 100) == 0.5
    assert schedule("linear(1.0,0.0,10)", 0) == 1.0
    assert schedule("linear(1.0,0.0,10)", 5) == 0.5
    assert schedule("linear(1.0,0.0,10)", 20) == 0.0
    assert schedule("step_linear(1.0,0.5,10,0.0,10)", 15) == 0.25


def test_accuracy_topk():
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    target = jnp.asarray([1, 2])
    top1, top2 = accuracy(logits, target, topk=(1, 2))
    assert float(top1) == 0.5  # fraction, not percent (reference utils.py:75)
    assert float(top2) == 0.5  # row 1: top-2 is {0,1} (stable tie), target 2 missed


def test_soft_update_and_eval_mode():
    a = {"w": jnp.ones((2,))}
    b = {"w": jnp.zeros((2,))}
    out = soft_update_params(a, b, tau=0.25)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.25)
    with eval_mode("anything"):
        pass


def test_honor_jax_platforms_env(monkeypatch):
    """The shared CLI guard re-applies JAX_PLATFORMS into jax.config
    (sitecustomize consumes the env var before user code runs)."""
    import jax

    from r3m_tpu.utils.misc import honor_jax_platforms_env

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    honor_jax_platforms_env()
    assert jax.config.jax_platforms == "cpu"
    # unset -> no-op, config untouched
    monkeypatch.delenv("JAX_PLATFORMS")
    honor_jax_platforms_env()
    assert jax.config.jax_platforms == "cpu"
