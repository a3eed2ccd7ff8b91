"""Pallas backward kernel vs jnp reverse-mode AD on the same sample lattice."""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu import Camera, RenderConfig, cornell_box
from pathtrace_tpu.grad import render_loss_grads
from pathtrace_tpu.ops.pallas_grad import pallas_loss_and_grads

CFG = RenderConfig(width=128, height=16, spp=4, backend="jnp", seed=7)


@pytest.fixture(scope="module")
def setup():
    scene, cam = cornell_box(), Camera.create()
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.uniform(size=(16, 128, 3)), jnp.float32)
    return scene, cam, target


@pytest.mark.slow
def test_pallas_grads_match_jnp_ad(setup):
    """Same RNG lattice on both paths: the hand-derived product-chain
    backward must agree with autodiff (up to fp-rounding trajectory
    differences near silhouettes)."""
    scene, cam, target = setup
    loss_p, (ds_p, dc_p) = pallas_loss_and_grads(
        scene, cam, CFG, 0, target, interpret=True
    )
    loss_j, (ds_j, dc_j) = render_loss_grads(scene, cam, CFG, 0, target)
    np.testing.assert_allclose(float(loss_p), float(loss_j), rtol=1e-3)

    scale_e = np.abs(np.asarray(ds_j.emission)).max()
    np.testing.assert_allclose(
        np.asarray(ds_p.emission),
        np.asarray(ds_j.emission),
        rtol=2e-2,
        atol=2e-3 * max(scale_e, 1e-6),
    )
    scale_c = np.abs(np.asarray(ds_j.color)).max()
    np.testing.assert_allclose(
        np.asarray(ds_p.color),
        np.asarray(ds_j.color),
        rtol=2e-2,
        atol=2e-3 * max(scale_c, 1e-6),
    )
    # Geometry/camera grads are exactly zero for this loss on both paths.
    np.testing.assert_array_equal(np.asarray(ds_p.position), 0.0)
    np.testing.assert_array_equal(np.asarray(dc_p.position), 0.0)
    np.testing.assert_array_equal(np.asarray(ds_j.position), 0.0)


@pytest.mark.slow
def test_pallas_cross_grads_match_jnp_ad(setup):
    """The all-Pallas inverse-rendering step (cross-estimator over two
    independent renders) against jnp AD of the same estimator."""
    import dataclasses

    import jax
    from pathtrace_tpu.grad import render_color
    from pathtrace_tpu.ops.pallas_grad import pallas_cross_grads

    scene, cam, target = setup
    cfg = dataclasses.replace(CFG, spp=2)
    step = 3
    loss_p, d_p = pallas_cross_grads(scene, cam, cfg, step, target, interpret=True)

    def loss_fn(color, emission):
        s = scene.replace(color=color, emission=emission)
        a = render_color(s, cam, cfg, frame=2 * step)
        b = render_color(s, cam, cfg, frame=2 * step + 1)
        return jnp.mean((a - target) * (b - target))

    loss_j, (d_c, d_e) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        scene.color, scene.emission
    )
    np.testing.assert_allclose(float(loss_p), float(loss_j), rtol=1e-3)
    for got, want in ((d_p["color"], d_c), (d_p["emission"], d_e)):
        # atol at 2% of the gradient scale: a single MC sample whose fp
        # trajectory flips near a silhouette (interpret-mode vs fused-AD
        # rounding) moves one entry by ~1e-4 at these tiny magnitudes.
        scale = np.abs(np.asarray(want)).max()
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2 * max(scale, 1e-6)
        )


@pytest.mark.slow
def test_fused_matches_two_pass_replay(setup):
    """The single-pass fused kernel (cotangent-free accumulators contracted
    after the spp loop) against the two-pass replay kernel with the
    explicit MSE cotangent — identical lattice, so near-exact agreement."""
    from pathtrace_tpu.ops.pallas_grad import (
        fused_loss_grads_pallas,
        render_color_grads_pallas,
    )
    from pathtrace_tpu.ops.pallas_trace import render_channels_pallas

    scene, cam, target = setup
    loss_f, d_e_f, d_c_f, color_f = fused_loss_grads_pallas(
        scene, cam, CFG, 0, target, interpret=True
    )
    buf = render_channels_pallas(scene, cam, CFG, 0, interpret=True)
    color = buf[..., 0:3]
    denom = CFG.height * CFG.width * 3
    diff = color - target
    loss_r = jnp.sum(diff * diff) / denom
    d_e_r, d_c_r = render_color_grads_pallas(
        scene, cam, CFG, 0, 2.0 * diff / denom, interpret=True
    )
    np.testing.assert_allclose(np.asarray(color_f), np.asarray(color), atol=1e-6)
    np.testing.assert_allclose(float(loss_f), float(loss_r), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d_e_f), np.asarray(d_e_r), rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(d_c_f), np.asarray(d_c_r), rtol=1e-4, atol=1e-8)


def test_pallas_grads_nonzero(setup):
    """Fast smoke for the product-chain backward kernel (the full lattice
    comparisons above are slow-marked; this keeps one per-commit gate)."""
    import dataclasses

    scene, cam, target = setup
    small = dataclasses.replace(CFG, spp=1, max_bounces=2)
    _, (ds, _) = pallas_loss_and_grads(scene, cam, small, 0, target, interpret=True)
    assert float(jnp.abs(ds.emission).sum()) > 0
    assert float(jnp.abs(ds.color).sum()) > 0
    # The light's emission and the walls' albedo must carry gradient.
    assert float(jnp.abs(ds.emission[8]).sum()) > 0
    assert float(jnp.abs(ds.color[0]).sum()) > 0
