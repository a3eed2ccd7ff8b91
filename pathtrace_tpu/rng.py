"""Counter-based RNG for shard-invariant sampling.

The reference persists one curand XORWOW state per pixel, seeded with the
pixel id (``src/pathtrace.cu:259-266``), and draws sequentially: 2 uniforms
of sub-pixel jitter per sample (iff spp != 1), then 2 uniforms per diffuse
bounce (``src/pathtrace.cu:126-136,222-225``). Sequential stateful streams
are hostile to SPMD — the draw order would depend on how samples are
sharded.

Here every random number is a pure function of ``(seed, frame, sample_index,
draw_slot)`` via JAX's threefry: fold the integers into a key and generate
the whole ``[spp, H, W, n_draws]`` lattice at once. Re-sharding the spp or
tile axes cannot change any value, so sharded and single-chip renders are
bit-identical. "Resuming" frame-to-frame RNG progression (the reference's
persistent curand state) is just incrementing ``frame``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Draw-slot layout per (sample, pixel): slots 0-1 sub-pixel jitter,
# slots 2 + 2*b + {0,1} the two uniforms of the cosine-weighted bounce b.
JITTER_SLOTS = 2


def sample_key(seed: int, frame) -> jax.Array:
    """Key for one frame of one render stream."""
    key = jax.random.key(seed)
    return jax.random.fold_in(key, frame)


def sample_uniforms(
    key: jax.Array,
    spp: int,
    height: int,
    width: int,
    max_bounces: int,
    sample_offset: int = 0,
) -> jnp.ndarray:
    """All uniforms for a chunk of samples: [spp, H, W, 2 + 2*max_bounces].

    ``sample_offset`` is the global index of the chunk's first sample so
    that chunked/sharded renders draw from the same per-sample streams as a
    monolithic render (shard invariance).

    Values are in [0, 1). curand_uniform is (0, 1]; the only place the
    difference could matter is ``pow(u, 1/2)`` and ``u * 2pi`` in the cosine
    sampler, where both conventions are measure-equivalent.
    """
    n_draws = JITTER_SLOTS + 2 * max_bounces
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(sample_offset, sample_offset + spp)
    )
    return jax.vmap(
        lambda k: jax.random.uniform(k, (height, width, n_draws), jnp.float32)
    )(keys)
