"""Embedded denoiser inference: AOVs -> denoised color, in-process.

Replaces the reference's C++ <-> boost::python <-> PyTorch pointer-sharing
bridge (``src/main.cu:92-122``, ``denoise_cnn/train.py:48-76``): the AOV
buffer is already a JAX array on device, so inference is one jitted apply —
the zero-copy trick is the default data path here, not a hack.

Preprocessing matches ``test()`` (``train.py:50-55``): albedo-divide the
color, max-normalize depth and the 4 variances (models/preprocess.py).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from pathtrace_tpu.models.denoise_cnn import DenoiseCNN
from pathtrace_tpu.models.preprocess import preprocess_channels

_CACHE: Dict[str, tuple] = {}


def load_pretrained(checkpoint: str):
    """(model, state) from an orbax checkpoint dir (cached per path) —
    the ``load_pretrained`` of train.py:72-76."""
    if checkpoint not in _CACHE:
        from pathtrace_tpu.train import load_checkpoint

        _CACHE[checkpoint] = load_checkpoint(checkpoint)
    return _CACHE[checkpoint]


@functools.partial(jax.jit, static_argnames=("model",))
def _denoise_jit(model, params, batch_stats, channels):
    x = preprocess_channels(channels)[None]  # [1, H, W, 14]
    out = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False
    )
    return out[0]


def denoise_channels(channels: jnp.ndarray, checkpoint: str) -> jnp.ndarray:
    """Packed [H, W, 14] buffer -> denoised [H, W, 3] color."""
    model, state = load_pretrained(checkpoint)
    return _denoise_jit(model, state.params, state.batch_stats, channels)


def denoise_aovs(aovs, checkpoint: str) -> jnp.ndarray:
    """AOV dict -> denoised [H, W, 3] color."""
    from pathtrace_tpu.render import pack_channels

    return denoise_channels(pack_channels(aovs), checkpoint)
