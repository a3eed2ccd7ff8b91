"""Debug-mode / checkify sanitizer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu import Camera, RenderConfig, cornell_box
from pathtrace_tpu.utils.debug import checked_render, debug_mode


def test_checked_render_passes_on_valid_scene(scene, camera):
    cfg = RenderConfig(width=16, height=16, spp=2, backend="jnp")
    err, aovs = checked_render(scene, camera, cfg)
    err.throw()  # no violation
    assert aovs["color"].shape == (16, 16, 3)


def test_checked_render_catches_nan_scene(camera):
    # NaN emission propagates into color. (A NaN *position* is actually
    # benign: NaN comparisons are False, so the running-min intersect
    # treats that sphere as a miss.)
    scene = cornell_box()
    bad = scene.replace(emission=scene.emission.at[8, 0].set(jnp.nan))
    cfg = RenderConfig(width=16, height=16, spp=2, backend="jnp")
    err, _ = checked_render(bad, camera, cfg)
    with pytest.raises(Exception, match="non-finite"):
        err.throw()


def test_debug_mode_restores_flag():
    before = jax.config.jax_debug_nans
    with debug_mode():
        assert jax.config.jax_debug_nans
    assert jax.config.jax_debug_nans == before
