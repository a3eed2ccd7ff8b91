"""Spatially-sharded CNN inference with per-layer halo exchange.

The conv-world analog of context/sequence parallelism (SURVEY.md §5
"long-context"): for frames larger than one chip's memory, activations
shard by image rows across the mesh's "tiles" axis. Each 3x3 conv layer
exchanges ONE boundary row with its neighbor devices (``ppermute``) before
applying, and crops one row after.

The exchange must be per-layer, not a one-shot input halo: SAME padding
zeroes each layer's *activations* beyond the true image boundary, and with
bias+ReLU ``layer(0) != 0`` — a single input-halo pass diverges in the
boundary rows. With per-layer exchange, boundary shards receive zero rows
from the permute (devices with no source get zeros), which IS that layer's
SAME padding, so the sharded result equals full-frame application to float
tolerance for any stack of radius-1 SAME layers (e.g. SimpleDenoiseCNN).

The FPN DenoiseCNN's pyramid reaches a global receptive field through its
bottleneck; it cannot be halo-sharded and runs full-frame (its activations
shrink spatially as channels grow, so memory is not the constraint there).
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def conv3x3_layer(kernel, bias, relu: bool):
    """[h, W, Cin] -> [h, W, Cout] SAME conv (+ optional ReLU), NHWC/HWIO."""

    def fn(x):
        y = jax.lax.conv_general_dilated(
            x[None],
            kernel,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0] + bias
        return jax.nn.relu(y) if relu else y

    return fn


def apply_layers_sharded(
    layer_fns: Sequence[Callable[[jnp.ndarray], jnp.ndarray]],
    image: jnp.ndarray,
    mesh: Mesh,
    halo: int = 1,
) -> jnp.ndarray:
    """Apply a stack of spatially-local SAME layers (receptive-field radius
    <= halo each) over row shards of ``image`` with per-layer halo
    exchange."""
    n_t = mesh.shape["tiles"]
    h = image.shape[0]
    if h % n_t:
        raise ValueError(f"height {h} not divisible by tiles={n_t}")
    down = [(j, j + 1) for j in range(n_t - 1)]
    up = [(j + 1, j) for j in range(n_t - 1)]

    def shard_fn(local):  # [h/n, W, C]
        x = local
        for fn in layer_fns:
            # Neighbor halos; boundary shards get zeros == SAME padding.
            top = jax.lax.ppermute(x[-halo:], "tiles", down)
            bottom = jax.lax.ppermute(x[:halo], "tiles", up)
            padded = jnp.concatenate([top, x, bottom], axis=0)
            x = fn(padded)[halo:-halo]
        return x

    mapped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P("tiles", None, None),
        out_specs=P("tiles", None, None),
        check_vma=False,
    )
    sharding = NamedSharding(mesh, P("tiles", None, None))
    return jax.jit(mapped)(jax.device_put(image, sharding))


def denoise_spatially_sharded(
    channels: jnp.ndarray, mesh: Mesh, params=None, model=None
) -> jnp.ndarray:
    """Sharded inference of the baseline denoiser over a large frame.

    channels: preprocessed [H, W, 14]; returns [H, W, 3].
    """
    from pathtrace_tpu.models.simple_cnn import SimpleDenoiseCNN

    if model is None:
        model = SimpleDenoiseCNN()
    if params is None:
        raise ValueError("params required")
    layers = [
        conv3x3_layer(
            params[f"conv{i + 1}"]["kernel"], params[f"conv{i + 1}"]["bias"], True
        )
        for i in range(model.depth)
    ]
    layers.append(conv3x3_layer(params["head"]["kernel"], params["head"]["bias"], False))
    return apply_layers_sharded(layers, channels, mesh)
