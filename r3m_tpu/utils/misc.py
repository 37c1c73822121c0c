"""General training utilities (JAX-native counterparts of r3m/utils/utils.py).

Includes the step predicates and timers the training loop uses
(``/root/reference/r3m/utils/utils.py:78-116``), seeding
(``:34-39``), and JAX equivalents of the DrQV2-inherited helpers the
reference carries (``:42-163``: EMA soft update, orthogonal init, top-k
accuracy, truncated normal, schedule parser) so downstream users of those
utilities find them here.
"""

from __future__ import annotations

import os
import random
import re
import time
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp


def honor_jax_platforms_env() -> None:
    """Re-apply ``JAX_PLATFORMS`` after interpreter start.

    Some images initialize JAX from sitecustomize, which consumes the env
    var before user code runs — ``JAX_PLATFORMS=cpu python -m r3m_tpu.embed``
    would silently land on the default (TPU) backend. Every CLI entry point
    calls this first so the documented env var actually works. No-op when
    the var is unset or the backend already matches.
    """
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def set_seed_everywhere(seed: int) -> jax.Array:
    """Seed python/numpy RNGs and return the root JAX PRNG key.

    (utils.py:34-39 seeds torch/cuda/numpy/random; JAX randomness is
    explicit, so the key is returned rather than hidden global state.)
    """
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


class Until:
    """True while step < until (utils.py:78-88)."""

    def __init__(self, until, action_repeat: int = 1):
        self._until = until
        self._action_repeat = action_repeat

    def __call__(self, step: int) -> bool:
        if self._until is None:
            return True
        return step < int(self._until) // self._action_repeat


class Every:
    """True every `every` steps (utils.py:90-101)."""

    def __init__(self, every, action_repeat: int = 1):
        self._every = every
        self._action_repeat = action_repeat

    def __call__(self, step: int) -> bool:
        if self._every is None or int(self._every) <= 0:
            # eval_freq=None/0 is the documented off-switch (the reference
            # would ZeroDivisionError at 0)
            return False
        # A positive `every` below action_repeat must NOT silently mean
        # "never" (a user asking for frequent eval would get none) — clamp
        # to every step instead.
        every = max(1, int(self._every) // self._action_repeat)
        return step % every == 0


class Timer:
    """Reset/elapsed/total wall-clock timer (utils.py:104-116)."""

    def __init__(self):
        self._start_time = time.time()
        self._last_time = time.time()

    def reset(self):
        elapsed = time.time() - self._last_time
        self._last_time = time.time()
        total = time.time() - self._start_time
        return elapsed, total

    def total_time(self) -> float:
        return time.time() - self._start_time


def pad_batch(arr: np.ndarray, n: int) -> np.ndarray:
    """Pad axis 0 to length `n` by repeating the last element.

    Tail batches padded to the fixed chunk size keep ONE compiled program
    shape; callers slice the padded rows off the output. Shared by the
    BC probe's chunked embedder and the embed CLI.
    """
    m = arr.shape[0]
    if m >= n:
        return arr
    return np.concatenate([arr, np.repeat(arr[-1:], n - m, axis=0)])


def soft_update_params(net_params, target_params, tau: float):
    """EMA pytree update (utils.py:42-45)."""
    return jax.tree_util.tree_map(
        lambda p, t: tau * p + (1 - tau) * t, net_params, target_params
    )


def orthogonal_init(key, shape, gain: float = 1.0, dtype=jnp.float32):
    """Orthogonal weight init (utils.py:52-61 applies nn.init.orthogonal_)."""
    return jax.nn.initializers.orthogonal(scale=gain)(key, shape, dtype)


def accuracy(output: jax.Array, target: jax.Array, topk: Sequence[int] = (1,)):
    """Top-k accuracy over logits [B, C] (utils.py:63-76).

    Returns fractions in [0, 1], matching the reference's
    ``correct_k.mul_(1.0 / batch_size)`` (utils.py:75) — NOT percent.
    """
    maxk = max(topk)
    pred = jnp.argsort(-output, axis=-1)[:, :maxk]  # [B, maxk]
    correct = pred == target[:, None]
    res = []
    for k in topk:
        res.append(jnp.mean(jnp.any(correct[:, :k], axis=-1).astype(jnp.float32)))
    return res


def truncated_normal(key, shape, mean=0.0, std=1.0, low=-2.0, high=2.0):
    """Samples from a truncated normal (utils.py:119-140 TruncatedNormal)."""
    z = jax.random.truncated_normal(key, low, high, shape)
    return mean + std * z


def schedule(schdl, step: int) -> float:
    """Parse 'linear(init,final,duration)' / 'step_linear(...)' or a float
    constant (utils.py:143-163). One grammar, one parser: this is the
    host-side float view of `schedule_fn`."""
    return float(schedule_fn(schdl)(step))


def schedule_fn(schdl):
    """Compile a `schedule()` string into a jit-traceable step->lr function.

    Same grammar as `schedule` (utils.py:143-163): a float constant,
    'linear(init,final,duration)', or 'step_linear(init,final1,duration1,
    final2,duration2)'. The string is parsed ONCE here; the returned
    closure uses jnp ops only, so it can serve as an optax learning-rate
    schedule inside a jitted train step.
    """
    try:
        const = float(schdl)
        return lambda step: jnp.asarray(const, jnp.float32)
    except ValueError:
        pass
    match = re.match(r"linear\((.+),(.+),(.+)\)", schdl)
    if match:
        init, final, duration = (float(g) for g in match.groups())

        def linear(step):
            mix = jnp.clip(step / duration, 0.0, 1.0)
            return (1.0 - mix) * init + mix * final

        return linear
    match = re.match(r"step_linear\((.+),(.+),(.+),(.+),(.+)\)", schdl)
    if match:
        init, final1, duration1, final2, duration2 = (
            float(g) for g in match.groups()
        )

        def step_linear(step):
            mix1 = jnp.clip(step / duration1, 0.0, 1.0)
            mix2 = jnp.clip((step - duration1) / duration2, 0.0, 1.0)
            return jnp.where(
                step <= duration1,
                (1.0 - mix1) * init + mix1 * final1,
                (1.0 - mix2) * final1 + mix2 * final2,
            )

        return step_linear
    raise NotImplementedError(schdl)


class eval_mode:
    """API-parity shim for the reference's `eval_mode` context
    (utils.py:18-31). Functional JAX models have no global train/eval
    switch — mode is an explicit `train=` argument — so entering this
    context is a no-op; it exists so reference-style call sites port
    cleanly."""

    def __init__(self, *models):
        self.models = models

    def __enter__(self):
        return self

    def __exit__(self, *args):
        return False
