"""Inverse rendering: recover corrupted sphere albedos from a target image."""

import jax.numpy as jnp
import numpy as np

from pathtrace_tpu import Camera, RenderConfig, cornell_box
from pathtrace_tpu.inverse import recover_scene


def test_recover_wall_albedo():
    """Corrupt the red wall to grey; Adam on pixel L2 must pull it back
    toward red. Tiny render (32^2, 2 spp) keeps CI fast — convergence
    quality is bounded by MC noise, so assert direction + improvement."""
    scene = cornell_box()
    cam = Camera.create()
    cfg = RenderConfig(width=32, height=32, spp=8, backend="jnp", seed=11)

    corrupted = scene.replace(
        color=scene.color.at[0].set(jnp.array([0.5, 0.5, 0.5]))
    )
    recovered, losses = recover_scene(
        scene, corrupted, cam, cfg,
        optimize=("color",), steps=120, learning_rate=5e-2, target_spp=32,
    )
    # The cross-estimator loss is an unbiased but noisy readout; the gate
    # is parameter recovery itself.
    rec = np.asarray(recovered.color[0])
    true = np.asarray(scene.color[0])  # (0.75, 0.25, 0.25)
    assert np.all(np.isfinite(np.asarray(losses)))
    np.testing.assert_allclose(rec, true, atol=0.12)


def test_recover_keeps_other_params():
    scene = cornell_box()
    cam = Camera.create()
    cfg = RenderConfig(width=16, height=16, spp=2, backend="jnp", seed=3)
    corrupted = scene.replace(color=scene.color.at[1].set(jnp.ones(3) * 0.4))
    recovered, _ = recover_scene(
        scene, corrupted, cam, cfg, optimize=("color",), steps=5
    )
    np.testing.assert_array_equal(
        np.asarray(recovered.position), np.asarray(scene.position)
    )
    np.testing.assert_array_equal(
        np.asarray(recovered.radius), np.asarray(scene.radius)
    )
