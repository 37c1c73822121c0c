"""Pallas fused maxpool kernels: bit-exact parity vs lax (interpreter mode).

The kernels compile and are bit-exact on real TPU too (verified on v5e);
CPU CI runs them through the Pallas interpreter.
"""

import numpy as np

import jax
import jax.numpy as jnp

from r3m_tpu.ops.pallas_pool import maxpool_3x3s2


def _ref(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def test_forward_bit_exact(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(maxpool_3x3s2(x, True)), np.asarray(_ref(x))
    )


def test_backward_bit_exact(rng):
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 8)).astype(np.float32))
    g1 = jax.grad(lambda x: jnp.sum(_ref(x) ** 2))(x)
    g2 = jax.grad(lambda x: jnp.sum(maxpool_3x3s2(x, True) ** 2))(x)
    np.testing.assert_array_equal(np.asarray(g2), np.asarray(g1))


def test_backward_ties_match_select_and_scatter(rng):
    """Duplicate maxima within a window route grad to the same position."""
    x = jnp.asarray(
        rng.integers(0, 3, size=(1, 8, 8, 8)).astype(np.float32)
    )  # many ties
    g1 = jax.grad(lambda x: jnp.sum(_ref(x) * 3.0))(x)
    g2 = jax.grad(lambda x: jnp.sum(maxpool_3x3s2(x, True) * 3.0))(x)
    np.testing.assert_array_equal(np.asarray(g2), np.asarray(g1))
