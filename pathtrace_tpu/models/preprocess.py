"""AOV preprocessing for the denoise CNN.

Exactly the reference's normalization, applied at both training-data load
(``denoise_cnn/load_data.py:21-30``) and embedded inference
(``denoise_cnn/train.py:50-55``):

  epsilon = 0.00316
  color      /= epsilon + albedo          (albedo divide; skipped for targets)
  depth      /= epsilon + max(depth)
  {color,normal,albedo,depth}_var /= epsilon + max(of that channel)

Targets keep only clip(color, 0, 1) (``load_data.py:32-35``).

Operates on the packed [..., H, W, 14] channel buffer (layout of
config.CHANNEL_NAMES); max-normalizations reduce over each image's own
spatial dims, matching the per-file/per-tensor maxima of the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

EPSILON = 0.00316


def preprocess_channels(buf: jnp.ndarray) -> jnp.ndarray:
    """Normalize a packed [..., H, W, 14] buffer for CNN input."""
    color = buf[..., 0:3]
    normal = buf[..., 3:6]
    albedo = buf[..., 6:9]
    depth = buf[..., 9:10]
    variances = buf[..., 10:14]

    color = color / (EPSILON + albedo)
    spatial = tuple(range(buf.ndim - 3, buf.ndim - 1))
    depth = depth / (EPSILON + jnp.max(depth, axis=spatial + (-1,), keepdims=True))
    variances = variances / (
        EPSILON + jnp.max(variances, axis=spatial, keepdims=True)
    )
    return jnp.concatenate([color, normal, albedo, depth, variances], axis=-1)


def preprocess_target(buf: jnp.ndarray) -> jnp.ndarray:
    """Ground-truth target: clipped color only ([..., H, W, 3])."""
    return jnp.clip(buf[..., 0:3], 0.0, 1.0)
