"""Denoise CNN architecture + preprocessing tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.models.denoise_cnn import DenoiseCNN, ResidualBlock
from pathtrace_tpu.models.preprocess import (
    EPSILON,
    preprocess_channels,
    preprocess_target,
)


def test_residual_block_halves_resolution():
    block = ResidualBlock(16)
    x = jnp.ones((2, 32, 32, 8))
    vars_ = block.init(jax.random.key(0), x)
    y = block.apply(vars_, x)
    assert y.shape == (2, 16, 16, 16)


def test_full_model_shapes_and_range():
    model = DenoiseCNN()  # full 6-block FPN as the reference
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 64, 64, 14)), jnp.float32)
    vars_ = model.init(jax.random.key(0), x)
    y = model.apply(vars_, x)
    assert y.shape == (1, 64, 64, 3)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0  # clamped output
    # Parameter inventory: 6 blocks + 7 laterals + 6 backwards + rgb head.
    params = vars_["params"]
    assert {f"block{i}" for i in range(1, 7)} <= set(params)
    assert {f"lat_{i}" for i in range(0, 7)} <= set(params)
    assert "rgb_conv" in params


def test_albedo_remultiply():
    """Output = clip(rgb * (eps + albedo)): zero-albedo pixels (the light)
    can only produce near-zero output through the eps term."""
    model = DenoiseCNN(widths=(8, 16))
    x = np.zeros((1, 32, 32, 14), np.float32)
    x[..., 6:9] = 0.0  # black albedo everywhere
    vars_ = model.init(jax.random.key(1), jnp.asarray(x))
    y = model.apply(vars_, jnp.asarray(x))
    assert float(jnp.max(y)) <= EPSILON * 10  # bounded by eps * max(rgb)


def test_batchnorm_updates_in_train_mode():
    model = DenoiseCNN(widths=(8, 16))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 32, 32, 14)), jnp.float32)
    vars_ = model.init(jax.random.key(0), x, train=False)
    _, updates = model.apply(vars_, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(vars_["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )


def test_preprocess_semantics():
    rng = np.random.default_rng(3)
    buf = rng.uniform(0.1, 2.0, size=(16, 16, 14)).astype(np.float32)
    out = np.asarray(preprocess_channels(jnp.asarray(buf)))
    # Color divided by eps + albedo.
    np.testing.assert_allclose(
        out[..., 0:3], buf[..., 0:3] / (EPSILON + buf[..., 6:9]), rtol=1e-6
    )
    # Normal + albedo untouched.
    np.testing.assert_array_equal(out[..., 3:9], buf[..., 3:9])
    # Depth and variances max-normalized.
    np.testing.assert_allclose(
        out[..., 9], buf[..., 9] / (EPSILON + buf[..., 9].max()), rtol=1e-6
    )
    for c in range(10, 14):
        np.testing.assert_allclose(
            out[..., c], buf[..., c] / (EPSILON + buf[..., c].max()), rtol=1e-6
        )


def test_preprocess_target_clips():
    buf = np.zeros((4, 4, 14), np.float32)
    buf[..., 0] = 3.0
    buf[..., 1] = -1.0
    buf[..., 2] = 0.5
    out = np.asarray(preprocess_target(jnp.asarray(buf)))
    assert out.shape == (4, 4, 3)
    np.testing.assert_array_equal(out[..., 0], 1.0)
    np.testing.assert_array_equal(out[..., 1], 0.0)
    np.testing.assert_array_equal(out[..., 2], 0.5)


def test_batched_preprocess():
    buf = jnp.ones((2, 8, 8, 14))
    out = preprocess_channels(buf)
    assert out.shape == (2, 8, 8, 14)


def test_simple_cnn_baseline():
    """The TF-experiment analog: resolution-preserving plain conv net
    trains with summed-L1 + Adam."""
    import jax.numpy as jnp

    from pathtrace_tpu.models.simple_cnn import (
        create_simple_state,
        simple_train_step,
    )

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(size=(2, 32, 32, 14)), jnp.float32)
    y = jnp.asarray(x[..., :3] * 0.5)
    model, params, opt_state, _ = create_simple_state(
        jax.random.key(0), (32, 32, 14)
    )
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 32, 32, 3)
    losses = []
    for _ in range(20):
        params, opt_state, loss = simple_train_step(model, params, opt_state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
