"""Frozen-decision record/replay (ops/frozen.py) — the gradient oracle.

Chain of trust for geometry/camera gradients (docs/GRAD_GATE.md):
1. record mode == the real renderer (bitwise color);
2. grad(frozen replay) == grad(detached-decision estimator) at the record
   point — proves the decision capture is COMPLETE (any un-frozen discrete
   choice would change the derivative);
3. central FD of the frozen replay == its AD gradient — a true
   finite-difference check of the continuous math with silhouette terms
   structurally absent (no masking heuristics).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu import Camera, RenderConfig, cornell_box
from pathtrace_tpu.grad import render_loss_grads
from pathtrace_tpu.ops.frozen import (
    record_frame,
    replay_color,
    replay_loss,
    replay_loss_grads,
)
from pathtrace_tpu.render import render_aovs

CFG = RenderConfig(width=32, height=32, spp=4, backend="jnp", seed=5, spp_chunk=2)
CFG_NEE = dataclasses.replace(CFG, nee=True)


@pytest.fixture(scope="module")
def setup():
    return cornell_box(), Camera.create()


@pytest.mark.parametrize("cfg", [CFG, CFG_NEE], ids=["diffuse", "nee"])
def test_record_matches_renderer_bitwise(setup, cfg):
    """Record mode is op-for-op the renderer: bitwise-equal color against
    the EAGER pipeline (the jitted pipeline itself flips the odd borderline
    lane vs its own eager execution — XLA fma contraction — which is
    orthogonal to what is asserted here)."""
    from pathtrace_tpu.render import accumulate_frame

    scene, cam = setup
    sums, _ = accumulate_frame(scene, cam, cfg, 0)
    color_ref = np.asarray(sums["color"] / cfg.spp)
    color_rec, _ = record_frame(scene, cam, cfg)
    np.testing.assert_array_equal(np.asarray(color_rec), color_ref)


@pytest.mark.parametrize("cfg", [CFG, CFG_NEE], ids=["diffuse", "nee"])
@pytest.mark.slow
def test_replay_reproduces_forward(setup, cfg):
    scene, cam = setup
    color_rec, recs = record_frame(scene, cam, cfg)
    eye, basis = cam.position, cam.eye_ray_basis(cfg.width, cfg.height)
    color_rep = replay_color(scene, eye, basis, cfg, 0, recs)
    np.testing.assert_allclose(
        np.asarray(color_rep), np.asarray(color_rec), rtol=0, atol=1e-6
    )


@pytest.mark.slow
def test_frozen_grad_equals_estimator(setup):
    """grad of the frozen replay == grad of the live estimator at the
    record point, for EVERY parameter — decision capture is complete."""
    scene, cam = setup
    cfg = CFG_NEE
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    _, recs = record_frame(scene, cam, cfg)
    loss_f, (ds_f, dc_f) = replay_loss_grads(scene, cam, cfg, 0, recs, target)

    # The live estimator, EAGER (the jitted entry flips the odd borderline
    # decision vs eager execution — see test_record_matches_renderer_bitwise).
    from pathtrace_tpu.grad import l2_image_loss, render_color

    def live_loss(scene_, cam_):
        return l2_image_loss(render_color(scene_, cam_, cfg, 0), target)

    loss_l, (ds_l, dc_l) = jax.value_and_grad(live_loss, argnums=(0, 1))(
        scene, cam
    )
    np.testing.assert_allclose(float(loss_f), float(loss_l), rtol=1e-6)
    for a, b, name in [
        (ds_f.color, ds_l.color, "albedo"),
        (ds_f.emission, ds_l.emission, "emission"),
        (ds_f.position, ds_l.position, "position"),
        (ds_f.radius, ds_l.radius, "radius"),
        (dc_f.position, dc_l.position, "cam position"),
        (dc_f.yaw, dc_l.yaw, "yaw"),
        (dc_f.pitch, dc_l.pitch, "pitch"),
    ]:
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), np.abs(b).max(), 1e-12)
        assert np.abs(a - b).max() / scale < 2e-4, name


@pytest.mark.slow
@pytest.mark.parametrize(
    "pick,perturb,eps",
    [
        (
            lambda ds, dc: ds.position[6, 2],
            lambda s, c, h: (s.replace(position=s.position.at[6, 2].add(h)), c),
            1e-3,
        ),
        (
            # Radius needs a small eps: grazing lanes put sqrt(r^2 - d^2)
            # near its curvature blow-up, so the second-order FD error
            # dominates at wide brackets (a property of the function, not
            # a masking concern — the f64 replay lets eps shrink safely).
            lambda ds, dc: ds.radius[6],
            lambda s, c, h: (s.replace(radius=s.radius.at[6].add(h)), c),
            1e-4,
        ),
        (
            lambda ds, dc: dc.position[2],
            lambda s, c, h: (
                s,
                dataclasses.replace(c, position=c.position.at[2].add(h)),
            ),
            2e-3,
        ),
        (
            lambda ds, dc: dc.yaw,
            lambda s, c, h: (s, dataclasses.replace(c, yaw=c.yaw + h)),
            1e-4,
        ),
    ],
    ids=["sphere_z", "radius", "camera_z", "yaw"],
)
def test_frozen_fd_matches_ad(setup, pick, perturb, eps):
    """Central FD of the frozen replay vs its AD gradient: geometry and
    camera parameters under NEE, NO masking — frozen decisions make the
    replay smooth, so plain FD is a valid oracle. Both sides run in f64
    (the perturbation would otherwise quantize to f32 ulps, and the f32
    gradient itself carries percent-level accumulation noise on the
    heavy-cancellation geometry sums — that noise is quantified by
    scripts/grad_gate.py, not here)."""
    scene, cam = setup
    cfg = CFG_NEE
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    _, recs = record_frame(scene, cam, cfg)

    with jax.enable_x64(True):
        _, (ds, dc) = replay_loss_grads(
            scene, cam, cfg, 0, recs, target, dtype=jnp.float64
        )
        ad = float(pick(ds, dc))

        import dataclasses as dc_mod

        scene64 = scene.replace(
            radius=scene.radius.astype(jnp.float64),
            position=scene.position.astype(jnp.float64),
            emission=scene.emission.astype(jnp.float64),
            color=scene.color.astype(jnp.float64),
        )
        cam64 = dc_mod.replace(
            cam,
            position=cam.position.astype(jnp.float64),
            yaw=cam.yaw.astype(jnp.float64),
            pitch=cam.pitch.astype(jnp.float64),
        )

        def loss_at(h):
            s, c = perturb(scene64, cam64, h)
            return float(
                replay_loss(s, c, cfg, 0, recs, target, dtype=jnp.float64)
            )

        fd = (loss_at(eps) - loss_at(-eps)) / (2 * eps)
    denom = max(abs(ad), abs(fd), 1e-12)
    # eps sits on each parameter's FD plateau: wider brackets pick up the
    # huge curvature of grazing-lane sqrt(r^2 - d^2) terms, narrower ones
    # hit the piecewise-smooth kink floor (clip/clamp crossings), which
    # bounds agreement at ~1e-2 for the heavy-cancellation parameters
    # (radius, yaw) whose net value is tiny vs per-lane contributions.
    assert abs(ad - fd) / denom < 2e-2, (ad, fd)


def test_scene_replace_preserves_f64(setup):
    """Scene.__init__ must not re-quantize floating inputs to f32: the f64
    oracle perturbs parameters through replace(), and a silent f32 cast
    rounds the FD step to f32 ulps (eps=2e-4 at z=47 quantizes to 52/52.4
    ulp — a uniform 4e-3 FD error measured at 512^2 before the fix)."""
    scene, _ = setup
    with jax.enable_x64(True):
        s64 = scene.replace(position=scene.position.astype(jnp.float64))
        assert s64.position.dtype == jnp.float64
        eps = 2e-4
        pp = s64.replace(position=s64.position.at[6, 2].add(eps))
        assert float(pp.position[6, 2] - s64.position[6, 2]) == pytest.approx(
            eps, rel=1e-9
        )
    # default path still canonicalizes non-float input to f32
    assert scene.replace(radius=[1.0] * scene.num_objects).radius.dtype == jnp.float32
