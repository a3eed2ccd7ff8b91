"""Hemisphere sampling (diffuse BRDF) and direct lighting.

Reproduces the reference's cosine-weighted sampler
(``src/pathtrace.cu:121-136``): build an orthonormal basis around the
(normalized) normal via the "combing coconuts" ortho vector, then sample
with ``power = 1`` — i.e. pdf proportional to cos(theta):

    phi   = 2*pi*u1
    z     = u2 ** (1 / (power+1)) = sqrt(u2)
    sin_t = sqrt(1 - z*z)
    dir   = cos(phi)*sin_t*o1 + sin(phi)*sin_t*o2 + z*n
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def _normalize(v, eps=1e-20):
    # eps is far below f32 ulp for unit-scale vectors (bit-identical
    # forward) but keeps reverse-mode AD finite on masked-out zero lanes.
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps)


def ortho_vector(v, cond=None):
    """A vector orthogonal to v (reference ``orthoVector``,
    ``pathtrace.cu:121-124``): (-y, x, 0) if |x| > |z| else (0, -z, y).

    ``cond`` optionally supplies the branch selector from outside — the
    frozen-decision replay (ops/frozen.py) records it at the base point so
    finite differences of the replay never cross this discrete branch."""
    if cond is None:
        cond = jnp.abs(v[..., 0]) > jnp.abs(v[..., 2])
    a = jnp.stack([-v[..., 1], v[..., 0], jnp.zeros_like(v[..., 0])], axis=-1)
    b = jnp.stack([jnp.zeros_like(v[..., 0]), -v[..., 2], v[..., 1]], axis=-1)
    return jnp.where(cond[..., None], a, b)


def cosine_weighted_direction(normal, u1, u2, power: float = 1.0, ortho_cond=None):
    """Sample a direction about ``normal`` ([..., 3]) from uniforms u1, u2
    ([...]). power=1 gives the cosine-weighted pdf (``pathtrace.cu:127``);
    power=0 would be the unbiased uniform hemisphere noted in the reference
    comment.
    """
    n = _normalize(normal)
    o1 = _normalize(ortho_vector(n, cond=ortho_cond))
    o2 = _normalize(jnp.cross(n, o1))
    phi = u1 * TWO_PI
    z = jnp.power(u2, 1.0 / (power + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    d = (
        (jnp.cos(phi) * sin_t)[..., None] * o1
        + (jnp.sin(phi) * sin_t)[..., None] * o2
        + z[..., None] * n
    )
    # The reference normalizes the returned direction again when forming the
    # next ray (pathtrace.cu:180); keep that for bit-parity of unit length.
    return _normalize(d)


def reflect(incident, normal):
    """Mirror ``incident`` about ``normal`` (CUDA ``reflect``:
    I - 2 * dot(N, I) * N)."""
    return incident - 2.0 * jnp.sum(normal * incident, axis=-1, keepdims=True) * normal


def glossy_direction(normal, u1, u2, u3, u4, u5, ortho_cond=None):
    """The reference's "makeshift glossy BRDF" experiment
    (``pathtrace.cu:181-184``, commented out there; a working option here):
    reflect the cosine-weighted sample about the normal, perturb by
    ``0.01 * uniform3 - 0.005``, renormalize."""
    d = cosine_weighted_direction(normal, u1, u2, ortho_cond=ortho_cond)
    d = reflect(d, normal)
    jig = 0.01 * jnp.stack([u3, u4, u5], axis=-1) - 0.005
    return _normalize(d + jig)


def direct_lighting(scene, normal, position, light_index: int, push: float):
    """Lambert x emission x shadow toward the light's bottom point
    (reference ``getDirectLighting``, ``pathtrace.cu:138-148``; dead code
    there — optional NEE here)."""
    from pathtrace_tpu.ops.intersect import shadow_visibility

    light_bottom = scene.position[light_index] - jnp.array(
        [0.0, scene.radius[light_index], 0.0], jnp.float32
    )
    light_dir = _normalize(light_bottom - position)
    diffuse = jnp.clip(jnp.sum(light_dir * normal, axis=-1), 0.0, 1.0)
    shadow_origin = position + normal * push
    vis = shadow_visibility(shadow_origin, light_dir, scene, light_index)
    return (diffuse * vis)[..., None] * scene.emission[light_index]
