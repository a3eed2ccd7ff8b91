"""BASELINE config #5 integration: large-frame sharded render feeding
spatially-sharded CNN inference on the 8-device mesh — renderer output
stays on device end to end (the reference's zero-copy CUDA<->torch trick,
SURVEY.md §3.5, as the default data path)."""

import jax
import numpy as np
import pytest

from pathtrace_tpu import Camera, RenderConfig, cornell_box
from pathtrace_tpu.models.simple_cnn import create_simple_state
from pathtrace_tpu.models.spatial import denoise_spatially_sharded
from pathtrace_tpu.parallel import make_mesh
from pathtrace_tpu.parallel.shard import render_channels_sharded


@pytest.mark.slow
def test_1024_sharded_render_into_spatial_cnn():
    assert len(jax.devices()) == 8
    scene, cam = cornell_box(), Camera.create()
    mesh = make_mesh(tiles=8, samples=1)
    # 1024^2 (2x the reference's hard 512 limit, main.cu:104) at smoke
    # depth; the Pallas path runs the same shapes on real chips.
    cfg = RenderConfig(width=1024, height=1024, spp=1, max_bounces=2, backend="jnp")
    buf = render_channels_sharded(scene, cam, cfg, mesh)
    assert buf.shape == (1024, 1024, 14)

    model, params, _, _ = create_simple_state(jax.random.key(0), (128, 1024, 14))
    rgb = denoise_spatially_sharded(buf, mesh, params=params, model=model)
    assert rgb.shape == (1024, 1024, 3)
    assert np.isfinite(np.asarray(rgb)).all()


@pytest.mark.slow
def test_1024_sharded_render_into_fpn_cnn():
    """Config #5 with the FLAGSHIP model (VERDICT r2 item #4): the 1024^2
    sharded render feeds the row-sharded FPN DenoiseCNN — the model the
    interactive denoised path actually uses — without ever materializing
    the frame on one device at full resolution in the encoder head."""
    from pathtrace_tpu.models.denoise_cnn import init_variables
    from pathtrace_tpu.models.fpn_spatial import denoise_fpn_sharded

    assert len(jax.devices()) == 8
    scene, cam = cornell_box(), Camera.create()
    mesh = make_mesh(tiles=8, samples=1)
    cfg = RenderConfig(width=1024, height=1024, spp=1, max_bounces=2, backend="jnp")
    buf = render_channels_sharded(scene, cam, cfg, mesh)

    model, variables = init_variables(jax.random.key(1), 64, 64)
    rgb = denoise_fpn_sharded(buf, mesh, variables, model=model)
    assert rgb.shape == (1024, 1024, 3)
    assert np.isfinite(np.asarray(rgb)).all()
