"""JS/KL divergence parity against scipy (what the reference scorer calls)."""

import numpy as np
import scipy.stats
import jax.numpy as jnp

from cald_tpu.ops import js_divergence, kl_divergence


def test_kl_matches_scipy(rng):
    p = rng.uniform(0.01, 1.0, (8, 21)).astype(np.float32)
    q = rng.uniform(0.01, 1.0, (8, 21)).astype(np.float32)
    got = np.asarray(kl_divergence(jnp.asarray(p), jnp.asarray(q)))
    want = np.array([scipy.stats.entropy(p[i], q[i]) for i in range(8)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)  # float32 sums


def test_js_matches_reference_formula(rng):
    """Reference: m = (p+q)/2 on raw rows, js = .5*entropy(p,m) + .5*entropy(q,m),
    clamped at zero (/root/reference/cald_train.py:211-216)."""
    p = rng.uniform(0.0, 1.0, (16, 21)).astype(np.float32)
    q = rng.uniform(0.0, 1.0, (16, 21)).astype(np.float32)
    got = np.asarray(js_divergence(jnp.asarray(p), jnp.asarray(q)))
    m = (p + q) / 2
    want = np.array([
        max(0.0, 0.5 * scipy.stats.entropy(p[i], m[i]) + 0.5 * scipy.stats.entropy(q[i], m[i]))
        for i in range(16)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_js_zero_for_identical_rows(rng):
    p = rng.uniform(0.1, 1.0, (4, 10)).astype(np.float32)
    got = np.asarray(js_divergence(jnp.asarray(p), jnp.asarray(p)))
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_js_handles_zeros_in_rows():
    p = jnp.asarray([[0.0, 0.5, 0.5, 0.0]])
    q = jnp.asarray([[0.5, 0.0, 0.5, 0.0]])
    got = np.asarray(js_divergence(p, q))
    m = np.array([[0.25, 0.25, 0.5, 0.0]])
    want = 0.5 * scipy.stats.entropy([0, .5, .5, 0], m[0]) + \
        0.5 * scipy.stats.entropy([.5, 0, .5, 0], m[0])
    np.testing.assert_allclose(got, [want], rtol=1e-5)
    assert np.isfinite(got).all()
