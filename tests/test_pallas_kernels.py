"""Pallas kernels: element-exact parity with the jnp reference
implementations (interpret mode on CPU — SURVEY.md §4; compiled-mode parity
is exercised by bench/TPU runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpsig_tpu.ops import signature as sig
from gpsig_tpu.ops.pallas.sig_gram import sig_gram_levels


@pytest.mark.parametrize("shape", [(3, 8, 8), (2, 5, 7), (4, 16, 16)])
def test_sig_gram_levels_matches_jnp(shape):
    rng = np.random.default_rng(0)
    M = jnp.asarray(0.4 * rng.standard_normal(shape), jnp.float32)
    nl = 4
    got = sig_gram_levels(M, nl, True)  # interpret mode
    want = sig.signature_kern(M, nl, order=1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6
    )


def test_sig_gram_levels_grad_matches_jnp():
    rng = np.random.default_rng(1)
    M = jnp.asarray(0.4 * rng.standard_normal((2, 6, 9)), jnp.float32)
    nl = 3
    w = jnp.asarray(rng.standard_normal((nl + 1, 2)), jnp.float32)

    g1 = jax.grad(
        lambda m: jnp.sum(w * sig_gram_levels(m, nl, True))
    )(M)
    g2 = jax.grad(
        lambda m: jnp.sum(w * sig.signature_kern(m, nl, order=1))
    )(M)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=2e-4, atol=1e-5
    )


def test_sig_gram_levels_padding_invariance():
    """Zero-padding of M must not change the level sums (alignment trick)."""
    rng = np.random.default_rng(2)
    M = jnp.asarray(0.4 * rng.standard_normal((2, 5, 6)), jnp.float32)
    Mp = jnp.pad(M, ((0, 0), (0, 3), (0, 10)))
    a = sig_gram_levels(M, 3, True)
    b = sig_gram_levels(Mp, 3, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
