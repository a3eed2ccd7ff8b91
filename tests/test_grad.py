"""Gradient correctness: reverse-mode AD vs central finite differences.

BASELINE gate: pixel gradients w.r.t. sphere position/radius/albedo/
emission and camera pose allclose against an FD oracle. Tolerances are
parameter-specific (SURVEY.md §7 hard-parts #1): albedo/emission gradients
are exact (linear paths); position/radius/camera gradients include detached
silhouette terms, so FD (which sees silhouette shifts) and AD (which
doesn't) are compared on a no-jitter, fixed-sample render where interior
terms dominate.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu import Camera, RenderConfig, cornell_box
from pathtrace_tpu.grad import (
    finite_difference,
    grad_config,
    render_aovs_diff,
    render_color,
    render_geometry_grads,
    render_loss_grads,
    render_scalar_grads,
)
from pathtrace_tpu.ops.variance import luminance
from pathtrace_tpu.scene import Scene

CFG = RenderConfig(width=32, height=32, spp=4, backend="jnp", seed=5)
CFG_NEE = dataclasses.replace(CFG, nee=True)


@pytest.fixture(scope="module")
def setup():
    return cornell_box(), Camera.create()


def mean_lum(scene, cam, cfg=CFG):
    return float(jnp.mean(luminance(render_color(scene, cam, cfg))))


def geom_probe(scene, cam, cfg=CFG):
    aovs = render_aovs_diff(scene, cam, cfg)
    return float(
        jnp.mean(aovs["depth"]) * 1e-4 + jnp.mean(aovs["normal"][..., 1])
    )


def test_grads_finite_and_nonzero(setup):
    scene, cam = setup
    loss, (d_scene, d_cam) = render_loss_grads(scene, cam, CFG)
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(d_scene) + jax.tree.leaves(d_cam):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert float(jnp.abs(d_scene.color).sum()) > 0
    assert float(jnp.abs(d_scene.emission).sum()) > 0
    # Geometry grads through the color loss are 0 by design (detached
    # estimator, piecewise-constant sample radiance); they flow through the
    # geometry AOVs and through NEE color — see the tests below.
    _, (dg_scene, dg_cam) = render_geometry_grads(scene, cam, CFG)
    assert float(jnp.abs(dg_cam.position).sum()) > 0
    assert float(jnp.abs(dg_scene.position).sum()) > 0


def test_albedo_grad_matches_fd(setup):
    scene, cam = setup
    _, (d_scene, _) = render_scalar_grads(scene, cam, CFG)
    # Perturb the red wall's green component and one ball's red component.
    for (i, c) in [(0, 1), (6, 0)]:
        def f(v, i=i, c=c):
            s = scene.replace(color=scene.color.at[i, c].set(float(v)))
            return mean_lum(s, cam)

        fd = finite_difference(f, np.asarray(scene.color[i, c]), eps=2e-3)
        ad = float(d_scene.color[i, c])
        np.testing.assert_allclose(ad, fd, rtol=0.08, atol=1e-5)


def test_emission_grad_matches_fd(setup):
    scene, cam = setup
    _, (d_scene, _) = render_scalar_grads(scene, cam, CFG)
    # Light's red emission: linear except where the first-bounce clamp
    # saturates (those pixels contribute 0 on both sides — FD agrees).
    def f(v):
        s = scene.replace(emission=scene.emission.at[8, 0].set(float(v)))
        return mean_lum(s, cam)

    fd = finite_difference(f, np.asarray(scene.emission[8, 0]), eps=2e-3)
    ad = float(d_scene.emission[8, 0])
    np.testing.assert_allclose(ad, fd, rtol=0.08, atol=1e-6)


def test_position_grad_matches_fd_geometry(setup):
    """Sphere position grads through the depth/normal AOVs (continuous)."""
    scene, cam = setup
    _, (d_scene, _) = render_geometry_grads(scene, cam, CFG)

    def f(v):
        s = scene.replace(position=scene.position.at[6, 2].set(float(v)))
        return geom_probe(s, cam)

    # eps must stay below the silhouette-crossing scale (~0.1 world units
    # at this resolution) or FD picks up boundary terms AD detaches.
    fd = finite_difference(f, np.asarray(scene.position[6, 2]), eps=0.05)
    ad = float(d_scene.position[6, 2])
    np.testing.assert_allclose(ad, fd, rtol=0.15, atol=3e-6)


def test_camera_grad_matches_fd_geometry(setup):
    """Camera translation moves EVERY silhouette (zoom), so a full-image
    probe is dominated by boundary terms AD detaches. Compare on an
    interior window that sees only the back wall — there depth is smooth
    in camera position and AD must match FD tightly."""
    scene, cam = setup
    window = (slice(13, 17), slice(14, 18))

    def probe(scene_, cam_):
        aovs = render_aovs_diff(scene_, cam_, CFG)
        return jnp.mean(aovs["depth"][window]) * 1e-4

    # Window really is interior back wall (not the same-colored ceiling,
    # whose depth is nearly z-invariant): uniform grey albedo AND far depth.
    aovs0 = render_aovs_diff(scene, cam, CFG)
    alb = np.asarray(aovs0["albedo"][window])
    assert np.allclose(alb, [0.75, 0.75, 0.75], atol=1e-5)
    assert float(np.asarray(aovs0["depth"][window]).mean()) > 12000.0

    ad = jax.grad(lambda c: probe(scene, c))(cam)

    def f(v):
        c = Camera(position=cam.position.at[2].set(float(v)), yaw=cam.yaw, pitch=cam.pitch)
        return float(probe(scene, c))

    fd = finite_difference(f, np.asarray(cam.position[2]), eps=0.2)
    np.testing.assert_allclose(float(ad.position[2]), fd, rtol=0.05, atol=1e-9)


def test_nee_gives_color_geometry_grads(setup):
    """With next-event estimation on, color gains a continuous dependence
    on geometry (Lambert cos term): position grads become nonzero and
    finite. (A whole-image FD oracle is dominated by the shadow/silhouette
    boundary terms AD deliberately detaches, so the quantitative FD gate
    here is the NEE emission path, which is exactly linear.)"""
    scene, cam = setup
    _, (d_scene, d_cam) = render_scalar_grads(scene, cam, CFG_NEE)
    for leaf in jax.tree.leaves(d_scene) + jax.tree.leaves(d_cam):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert float(jnp.abs(d_scene.position).sum()) > 0
    assert float(jnp.abs(d_cam.position).sum()) > 0

    def f(v):
        s = scene.replace(emission=scene.emission.at[8, 1].set(float(v)))
        return mean_lum(s, cam, CFG_NEE)

    fd = finite_difference(f, np.asarray(scene.emission[8, 1]), eps=2e-3)
    ad = float(d_scene.emission[8, 1])
    np.testing.assert_allclose(ad, fd, rtol=0.08, atol=1e-6)


@pytest.mark.slow
def test_remat_matches_plain(setup):
    """grad_config (chunked+remat) must give the same gradients."""
    scene, cam = setup
    cfg_chunked = grad_config(dataclasses.replace(CFG, spp_chunk=2))
    _, (g1, _) = render_scalar_grads(scene, cam, CFG)
    _, (g2, _) = render_scalar_grads(scene, cam, cfg_chunked)
    np.testing.assert_allclose(
        np.asarray(g1.color), np.asarray(g2.color), rtol=1e-3, atol=1e-7
    )


def test_radius_grad_finite(setup):
    scene, cam = setup
    _, (d_scene, _) = render_scalar_grads(scene, cam, CFG)
    assert np.all(np.isfinite(np.asarray(d_scene.radius)))
