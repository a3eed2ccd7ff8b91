"""Baseline plain-conv denoiser — the reference's TF experiment, kept alive.

The reference carries an abandoned TensorFlow-1 alternative denoiser
(``denoise_cnn/tensorflow_experiments/train.py:26-42``): four 3x3 conv
layers of 64 channels with ReLU and a 3-channel linear head, trained with
summed-L1 loss and Adam(1e-4) on 64^2 patches. This module provides that
capability as a maintained Flax model + training step — a useful
fast-to-train baseline against the full FPN DenoiseCNN.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


class SimpleDenoiseCNN(nn.Module):
    """conv3x3(64)+relu x depth, then conv3x3(3). NHWC, resolution-preserving."""

    features: int = 64
    depth: int = 4

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(self.depth):
            h = nn.relu(nn.Conv(self.features, (3, 3), padding="SAME",
                                name=f"conv{i + 1}")(h))
        return nn.Conv(3, (3, 3), padding="SAME", name="head")(h)


def create_simple_state(rng_key, sample_shape=(64, 64, 14),
                        learning_rate: float = 1e-4):
    """(params, opt_state, tx) with Adam(1e-4) (tensorflow_experiments/
    train.py:42)."""
    model = SimpleDenoiseCNN()
    params = model.init(rng_key, jnp.zeros((1,) + tuple(sample_shape)))["params"]
    tx = optax.adam(learning_rate)
    return model, params, tx.init(params), tx


@partial(jax.jit, static_argnames=("model",))
def simple_train_step(model, params, opt_state, batch, target,
                      learning_rate: float = 1e-4):
    """One Adam step on the summed-L1 loss (tensorflow_experiments/
    train.py:41)."""
    tx = optax.adam(learning_rate)

    def loss_fn(p):
        out = model.apply({"params": p}, batch)
        return jnp.sum(jnp.abs(out - target))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss
