"""Unit tests for ray-sphere/scene intersection against hand-computed hits."""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.ops.intersect import (
    T_MAX,
    intersect_scene,
    intersect_spheres,
    shadow_visibility,
)
from pathtrace_tpu.scene import Scene, cornell_box


def single_sphere(radius=1.0, pos=(0.0, 0.0, -5.0)):
    return Scene(
        radius=[radius], position=[pos], emission=[[0, 0, 0]], color=[[1, 1, 1]]
    )


def test_head_on_hit():
    scene = single_sphere()
    origin = jnp.array([0.0, 0.0, 0.0])
    direction = jnp.array([0.0, 0.0, -1.0])
    t, valid = intersect_spheres(origin, direction, scene.radius, scene.position)
    assert bool(valid[0])
    assert float(t[0]) == pytest.approx(4.0, abs=1e-5)


def test_miss():
    scene = single_sphere()
    origin = jnp.array([0.0, 10.0, 0.0])
    direction = jnp.array([0.0, 0.0, -1.0])
    _, valid = intersect_spheres(origin, direction, scene.radius, scene.position)
    assert not bool(valid[0])


def test_inside_sphere_hits_far_side():
    # The camera sits inside the giant wall spheres; tNear <= 0 must fall
    # back to tFar (reference pathtrace.cu:80-87).
    scene = single_sphere(radius=2.0, pos=(0.0, 0.0, 0.0))
    origin = jnp.array([0.0, 0.0, 0.0])
    direction = jnp.array([1.0, 0.0, 0.0])
    t, valid = intersect_spheres(origin, direction, scene.radius, scene.position)
    assert bool(valid[0])
    assert float(t[0]) == pytest.approx(2.0, abs=1e-5)


def test_behind_ray_invalid():
    scene = single_sphere(pos=(0.0, 0.0, 5.0))  # behind a -z ray
    origin = jnp.array([0.0, 0.0, 0.0])
    direction = jnp.array([0.0, 0.0, -1.0])
    _, valid = intersect_spheres(origin, direction, scene.radius, scene.position)
    assert not bool(valid[0])


def test_unnormalized_direction_scales_t():
    # t is measured in units of |direction| (the reference never normalizes
    # primary rays).
    scene = single_sphere()
    origin = jnp.array([0.0, 0.0, 0.0])
    direction = jnp.array([0.0, 0.0, -2.0])
    t, valid = intersect_spheres(origin, direction, scene.radius, scene.position)
    assert bool(valid[0])
    assert float(t[0]) == pytest.approx(2.0, abs=1e-5)


def test_nearest_and_tie_takes_first():
    scene = Scene(
        radius=[1.0, 1.0, 1.0],
        position=[(0, 0, -10.0), (0, 0, -5.0), (0, 0, -5.0)],
        emission=np.zeros((3, 3)),
        color=np.ones((3, 3)),
    )
    hit = intersect_scene(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([0.0, 0.0, -1.0]), scene
    )
    assert bool(hit.hit)
    assert int(hit.index) == 1  # first of the tied nearest pair
    assert float(hit.t) == pytest.approx(4.0, abs=1e-5)


def test_batched_matches_scalar(scene):
    # Tolerance note: the f64 oracle is exact; f32 scene coordinates bound
    # wall-sphere (r=1e5) hit accuracy to ~ulp(1e5) ~ 0.008 absolute in t
    # (the CUDA reference hid this by silently promoting its discriminant
    # to double). 0.05 absolute is ~5e-4 of scene scale — invisible.
    rng = np.random.default_rng(0)
    origins = rng.uniform([0, 0, 0], [99, 81, 170], size=(32, 3)).astype(np.float32)
    dirs = rng.normal(size=(32, 3)).astype(np.float32)
    hit = intersect_scene(jnp.asarray(origins), jnp.asarray(dirs), scene)
    from oracle import intersect_scene as oracle_intersect

    for i in range(32):
        o = oracle_intersect(origins[i], dirs[i], scene)
        if o is None:
            assert not bool(hit.hit[i])
        else:
            idx, t = o
            assert bool(hit.hit[i])
            assert int(hit.index[i]) == idx
            assert float(hit.t[i]) == pytest.approx(t, rel=2e-3, abs=0.05)


def test_shadow_visibility(scene):
    light = 8
    # Point on the floor looking up at the light: visible.
    origin = jnp.array([50.0, 1.0, 81.6])
    light_bottom = scene.position[light] - jnp.array([0.0, scene.radius[light], 0.0])
    direction = (light_bottom - origin) / jnp.linalg.norm(light_bottom - origin)
    assert float(shadow_visibility(origin, direction, scene, light)) == 1.0
    # Put a blocker between: occluded.
    blocked = scene.replace(
        radius=scene.radius.at[6].set(16.5),
        position=scene.position.at[6].set(jnp.array([50.0, 40.0, 81.6])),
    )
    assert float(shadow_visibility(origin, direction, blocked, light)) == 0.0
