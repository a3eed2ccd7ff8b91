"""Progressive accumulation: batch-merge equals monolithic; resume works."""

import dataclasses

import numpy as np
import pytest

from pathtrace_tpu import Camera, RenderConfig, cornell_box
from pathtrace_tpu.progressive import ProgressiveRenderer, render_high_spp
from pathtrace_tpu.render import render_aovs

CFG = RenderConfig(width=24, height=24, spp=12, backend="jnp", seed=4)


@pytest.mark.slow
def test_batched_equals_monolithic(scene, camera):
    ref = render_aovs(scene, camera, CFG)
    prog = ProgressiveRenderer(scene, camera, CFG)
    prog.accumulate(5).accumulate(4).accumulate(3)
    out = prog.aovs()
    assert prog.samples_done == 12
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), rtol=1e-3, atol=1e-3
        ), k


def test_save_load_resume(tmp_path, scene, camera):
    path = str(tmp_path / "prog.pkl")
    a = ProgressiveRenderer(scene, camera, CFG)
    a.accumulate(6)
    a.save(path)
    b = ProgressiveRenderer.load(path, scene, camera)
    assert b.samples_done == 6
    a.accumulate(6)
    b.accumulate(6)
    np.testing.assert_allclose(
        np.asarray(a.aovs()["color"]), np.asarray(b.aovs()["color"]), rtol=1e-5
    )


def test_render_high_spp_with_checkpoint(tmp_path, scene, camera):
    path = str(tmp_path / "gt.pkl")
    logs = []
    aovs = render_high_spp(
        scene, camera, CFG, total_spp=10, batch_spp=4,
        checkpoint_path=path, logger=logs.append,
    )
    assert aovs["color"].shape == (24, 24, 3)
    assert logs[-1].endswith("10/10 spp")
    # Resume from a completed checkpoint: no extra work, same result.
    aovs2 = render_high_spp(
        scene, camera, CFG, total_spp=10, batch_spp=4, checkpoint_path=path,
    )
    np.testing.assert_array_equal(
        np.asarray(aovs["color"]), np.asarray(aovs2["color"])
    )
