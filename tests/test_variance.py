"""Moment algebra tests: masked moments, Chan merges, Welford equivalence."""

import jax.numpy as jnp
import numpy as np

from pathtrace_tpu.ops.variance import (
    Moments,
    luminance,
    merge_moments,
    moments_from_samples,
    variance,
    zeros_moments,
)


def welford(xs):
    """Sequential Welford exactly as the reference (pathtrace.cu:39-65)."""
    n, mean, m2 = 0, 0.0, 0.0
    for x in xs:
        n += 1
        delta = x - mean
        mean += delta / n
        delta2 = x - mean
        m2 += delta * delta2
    var = m2 / (n - 1) if n >= 2 else 0.0
    return n, mean, var


def test_matches_sequential_welford():
    rng = np.random.default_rng(0)
    xs = rng.normal(2.0, 3.0, size=57)
    m = moments_from_samples(jnp.asarray(xs), jnp.ones(57, bool))
    n, mean, var = welford(xs)
    assert float(m.n) == n
    np.testing.assert_allclose(float(m.mean), mean, rtol=1e-6)
    np.testing.assert_allclose(float(variance(m)), var, rtol=1e-6)


def test_masked_moments():
    xs = jnp.asarray([1.0, 100.0, 3.0, 200.0])
    inc = jnp.asarray([True, False, True, False])
    m = moments_from_samples(xs, inc)
    assert float(m.n) == 2
    assert float(m.mean) == 2.0
    assert float(variance(m)) == 2.0  # var of {1,3}


def test_n_below_two_gives_zero_variance():
    m = moments_from_samples(jnp.asarray([5.0]), jnp.asarray([True]))
    assert float(variance(m)) == 0.0
    m0 = moments_from_samples(jnp.asarray([5.0]), jnp.asarray([False]))
    assert float(variance(m0)) == 0.0
    assert float(m0.mean) == 0.0


def test_chan_merge_equals_monolithic():
    rng = np.random.default_rng(1)
    xs = rng.normal(size=64).astype(np.float32)
    inc = rng.uniform(size=64) > 0.3
    whole = moments_from_samples(jnp.asarray(xs), jnp.asarray(inc))
    parts = [
        moments_from_samples(jnp.asarray(xs[i : i + 16]), jnp.asarray(inc[i : i + 16]))
        for i in range(0, 64, 16)
    ]
    merged = parts[0]
    for p in parts[1:]:
        merged = merge_moments(merged, p)
    np.testing.assert_allclose(float(merged.n), float(whole.n))
    np.testing.assert_allclose(float(merged.mean), float(whole.mean), rtol=1e-5)
    np.testing.assert_allclose(
        float(variance(merged)), float(variance(whole)), rtol=1e-4
    )


def test_merge_with_zeros_is_identity():
    m = moments_from_samples(jnp.asarray([1.0, 2.0, 3.0]), jnp.ones(3, bool))
    z = zeros_moments(())
    for merged in (merge_moments(m, z), merge_moments(z, m)):
        np.testing.assert_allclose(float(merged.mean), float(m.mean))
        np.testing.assert_allclose(float(merged.m2), float(m.m2), rtol=1e-6)


def test_merge_associative():
    rng = np.random.default_rng(2)
    ms = [
        moments_from_samples(jnp.asarray(rng.normal(size=8)), jnp.ones(8, bool))
        for _ in range(3)
    ]
    left = merge_moments(merge_moments(ms[0], ms[1]), ms[2])
    right = merge_moments(ms[0], merge_moments(ms[1], ms[2]))
    np.testing.assert_allclose(float(left.mean), float(right.mean), rtol=1e-6)
    np.testing.assert_allclose(float(left.m2), float(right.m2), rtol=1e-6)


def test_luminance():
    np.testing.assert_allclose(
        float(luminance(jnp.asarray([1.0, 1.0, 1.0]))), 1.0, rtol=1e-4
    )
    np.testing.assert_allclose(
        float(luminance(jnp.asarray([1.0, 0.0, 0.0]))), 0.2126, rtol=1e-5
    )
