"""Per-pixel feature variances as associative moment algebra.

The reference accumulates Welford running moments sequentially per CUDA
thread (``OnlineVarianceBuffer``, ``src/pathtrace.cu:39-65``). Sequential
state is the enemy of SPMD: instead we compute masked two-pass moments over a
batch of samples (algebraically the same sample variance) and merge partial
moments across spp chunks / mesh shards with Chan's parallel formula —
associative and numerically stable, so any tile/spp sharding yields the same
variance up to float rounding.

Variance definition matches ``getVariance`` (``pathtrace.cu:60-64``):
M2 / (n - 1), and 0 where n < 2.

Features are scalar luminances, 0.2126 r + 0.7152 g + 0.0722 b
(``pathtrace.cu:67-69``), except depth which uses the raw ray t.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# Plain numpy on purpose: a module-level jnp.array would initialise the
# XLA backend at import time, which breaks jax.distributed.initialize()
# in multi-process runs (it must run before any backend touch).
LUMA = np.array([0.2126, 0.7152, 0.0722], np.float32)


def luminance(rgb):
    """Rec.709 luma of [..., 3] (reference ``luminance``, pathtrace.cu:67)."""
    return jnp.sum(rgb * LUMA, axis=-1)


class Moments(NamedTuple):
    """Partial Welford moments; a commutative monoid under ``merge``.

    n:    [...] f32 — included-sample count
    mean: [...] f32 — mean of included samples (0 where n == 0)
    m2:   [...] f32 — sum of squared deviations from the mean
    """

    n: jnp.ndarray
    mean: jnp.ndarray
    m2: jnp.ndarray


def moments_from_samples(x, include, axis=0) -> Moments:
    """Masked moments of samples ``x`` along ``axis``.

    ``include`` is the per-sample mask; the reference's conditional
    ``updateVariance`` calls (escape paths skip the color update,
    ``pathtrace.cu:157-161``; normal/albedo/depth only count bounce-0 hits,
    ``pathtrace.cu:187-195``) become this mask.
    """
    inc = include.astype(x.dtype)
    n = jnp.sum(inc, axis=axis)
    safe_n = jnp.maximum(n, 1.0)
    mean = jnp.sum(x * inc, axis=axis) / safe_n
    centered = (x - jnp.expand_dims(mean, axis)) * inc
    m2 = jnp.sum(centered * centered, axis=axis)
    return Moments(n=n, mean=mean, m2=m2)


def merge_moments(a: Moments, b: Moments) -> Moments:
    """Chan et al. parallel-variance merge. Associative + commutative, so
    spp chunks and mesh shards (psum of pairwise merges / tree merges)
    reproduce the sequential result."""
    n = a.n + b.n
    safe_n = jnp.maximum(n, 1.0)
    delta = b.mean - a.mean
    mean = a.mean + delta * (b.n / safe_n)
    m2 = a.m2 + b.m2 + delta * delta * (a.n * b.n / safe_n)
    return Moments(n=n, mean=mean, m2=m2)


def zeros_moments(shape, dtype=jnp.float32) -> Moments:
    z = jnp.zeros(shape, dtype)
    return Moments(n=z, mean=z, m2=z)


def variance(m: Moments):
    """Sample variance M2/(n-1); 0 where n < 2 (pathtrace.cu:60-64)."""
    return jnp.where(m.n >= 2.0, m.m2 / jnp.maximum(m.n - 1.0, 1.0), 0.0)
