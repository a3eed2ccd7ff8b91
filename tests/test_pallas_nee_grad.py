"""Hand-derived NEE backward (ops/pallas_nee_grad.py) vs jnp reverse-mode
AD and the in-kernel-AD kernel, interpret mode on CPU.

The hand kernel must produce the SAME detached-decision estimator as
``jax.grad`` of the jnp backend on the same lattice — same tolerances as
tests/test_pallas_ad.py, since both kernels sum the same heavily-
cancelling per-sample geometry partials in different orders.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu import Camera, RenderConfig, cornell_box
from pathtrace_tpu.grad import render_color, l2_image_loss
from pathtrace_tpu.ops.pallas_nee_grad import (
    nee_grads_block_slab,
    nee_loss_and_grads_pallas,
)

CFG = RenderConfig(
    width=128, height=16, spp=2, max_bounces=3, backend="pallas", seed=3,
    nee=True,
)


@pytest.fixture(scope="module")
def setup():
    return cornell_box(), Camera.create()


def _assert_close(got, want, rtol=2e-3, atol_scale=1e-5, what=""):
    g, w = np.asarray(got), np.asarray(want)
    scale = max(float(np.abs(w).max()), 1e-12)
    np.testing.assert_allclose(
        g, w, rtol=rtol, atol=atol_scale * scale, err_msg=what
    )


@pytest.mark.slow
def test_nee_fused_matches_jnp(setup):
    scene, cam = setup
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)
    loss_p, (ds_p, dc_p) = nee_loss_and_grads_pallas(
        scene, cam, CFG, 0, target, interpret=True
    )

    jcfg = dataclasses.replace(CFG, backend="jnp")

    def loss_fn(scene_, cam_):
        return l2_image_loss(render_color(scene_, cam_, jcfg, 0), target)

    loss_j, (ds_j, dc_j) = jax.value_and_grad(loss_fn, argnums=(0, 1))(scene, cam)
    np.testing.assert_allclose(float(loss_p), float(loss_j), rtol=1e-4)
    _assert_close(ds_p.emission, ds_j.emission, what="emission")
    _assert_close(ds_p.color, ds_j.color, what="albedo")
    # Geometry: heavy f32 cancellation (r=1e5 walls) — same widened atol
    # as test_pallas_ad.py.
    _assert_close(ds_p.position, ds_j.position, atol_scale=2e-3, what="position")
    _assert_close(ds_p.radius, ds_j.radius, atol_scale=2e-3, what="radius")
    _assert_close(dc_p.position, dc_j.position, atol_scale=5e-3, what="cam pos")
    cam_scale = float(np.abs(np.asarray(dc_j.position)).max())
    np.testing.assert_allclose(
        float(dc_p.yaw), float(dc_j.yaw), atol=5e-2 * cam_scale, err_msg="yaw"
    )
    np.testing.assert_allclose(
        float(dc_p.pitch), float(dc_j.pitch), atol=5e-2 * cam_scale,
        err_msg="pitch",
    )
    assert float(np.abs(np.asarray(ds_p.position)).max()) > 0.0


@pytest.mark.slow
def test_nee_replay_matches_fused(setup):
    """Replay mode against the MSE cotangent must equal fused mode — the
    sharded path's building block is the same hand sweep with a known
    cotangent."""
    from pathtrace_tpu.ops.pallas_ad import grads_from_block
    from pathtrace_tpu.ops.pallas_trace import render_color_sums_pallas

    scene, cam = setup
    cfg = dataclasses.replace(CFG, spp=1, max_bounces=2)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    loss_f, (ds_f, dc_f) = nee_loss_and_grads_pallas(
        scene, cam, cfg, 0, target, interpret=True
    )
    color = render_color_sums_pallas(scene, cam, cfg, 0, interpret=True) / cfg.spp
    denom = cfg.height * cfg.width * 3
    ct = jnp.moveaxis(2.0 * (color - target) / cfg.spp, -1, 0)
    block = nee_grads_block_slab(scene, cam, cfg, 0, ct, interpret=True)
    ds_r, dc_r = grads_from_block(scene, cam, cfg, block / denom)
    for name in ("emission", "color", "position", "radius"):
        _assert_close(
            getattr(ds_r, name), getattr(ds_f, name), rtol=1e-4,
            atol_scale=1e-4, what=name,
        )
    _assert_close(dc_r.position, dc_f.position, rtol=1e-4, atol_scale=1e-4,
                  what="cam")


@pytest.mark.slow
def test_dispatch_uses_hand_kernel(setup):
    """pallas_loss_and_grads routes NEE diffuse to the hand kernel (and
    still covers glossy via the AD kernel)."""
    from pathtrace_tpu.ops.pallas_grad import pallas_loss_and_grads

    scene, cam = setup
    cfg = dataclasses.replace(CFG, spp=1, max_bounces=2)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    loss, (ds, dc) = pallas_loss_and_grads(scene, cam, cfg, 0, target,
                                           interpret=True)
    loss_h, (ds_h, dc_h) = nee_loss_and_grads_pallas(
        scene, cam, cfg, 0, target, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(loss), np.asarray(loss_h))
    np.testing.assert_array_equal(
        np.asarray(ds.position), np.asarray(ds_h.position)
    )
