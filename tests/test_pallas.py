"""Pallas megakernel vs the jnp oracle (interpret mode on CPU).

Geometry channels (bounce-0 AOVs) are RNG-free at spp=1 and must match the
jnp backend to float tolerance; color/variance channels use different (but
statistically equivalent) RNG streams and are compared in the moments.
"""

import dataclasses

import numpy as np
import pytest

from pathtrace_tpu import Camera, RenderConfig, cornell_box
from pathtrace_tpu.ops.pallas_trace import render_aovs_pallas, render_channels_pallas
from pathtrace_tpu.render import render_aovs


@pytest.fixture(scope="module")
def pair():
    scene, cam = cornell_box(), Camera.create()
    cfg = RenderConfig(width=128, height=16, spp=1, backend="jnp")
    ref = render_aovs(scene, cam, cfg)
    pal = render_aovs_pallas(scene, cam, cfg, interpret=True)
    return ref, pal


def test_geometry_channels_match(pair):
    ref, pal = pair
    np.testing.assert_array_equal(np.asarray(pal["albedo"]), np.asarray(ref["albedo"]))
    np.testing.assert_allclose(
        np.asarray(pal["normal"]), np.asarray(ref["normal"]), atol=2e-6
    )
    # depth ~1e4 in basis units; rsqrt vs sqrt rounding -> ~2e-4 relative
    np.testing.assert_allclose(
        np.asarray(pal["depth"]), np.asarray(ref["depth"]), rtol=5e-4
    )


def test_color_statistics_match(pair):
    ref, pal = pair
    rc, pc = np.asarray(ref["color"]), np.asarray(pal["color"])
    assert np.all(np.isfinite(pc))
    # Different RNG streams, same distribution: image means agree.
    assert abs(rc.mean() - pc.mean()) < 0.02


def test_moments_match_at_higher_spp():
    scene, cam = cornell_box(), Camera.create()
    cfg = RenderConfig(width=128, height=16, spp=16, backend="jnp")
    ref = render_aovs(scene, cam, cfg)
    pal = render_aovs_pallas(scene, cam, cfg, interpret=True)
    for k, tol in [("color", 0.01), ("color_var", 0.02)]:
        r, p = np.asarray(ref[k]), np.asarray(pal[k])
        assert abs(r.mean() - p.mean()) < tol, k
    r, p = np.asarray(ref["depth_var"]), np.asarray(pal["depth_var"])
    assert abs(r.mean() - p.mean()) / max(r.mean(), 1.0) < 0.1


def test_non_tile_aligned_size():
    """Odd sizes pad internally and crop back."""
    scene, cam = cornell_box(), Camera.create()
    cfg = RenderConfig(width=130, height=13, spp=1, backend="jnp")
    ref = render_aovs(scene, cam, cfg)
    pal = render_aovs_pallas(scene, cam, cfg, interpret=True)
    assert np.asarray(pal["color"]).shape == (13, 130, 3)
    np.testing.assert_array_equal(np.asarray(pal["albedo"]), np.asarray(ref["albedo"]))


def test_packed_channel_layout():
    scene, cam = cornell_box(), Camera.create()
    cfg = RenderConfig(width=128, height=8, spp=1)
    buf = render_channels_pallas(scene, cam, cfg, interpret=True)
    assert buf.shape == (8, 128, 14)


def test_seed_and_frame_change_samples():
    scene, cam = cornell_box(), Camera.create()
    cfg = RenderConfig(width=128, height=8, spp=2)
    a = render_channels_pallas(scene, cam, cfg, frame=0, interpret=True)
    b = render_channels_pallas(scene, cam, cfg, frame=1, interpret=True)
    c = render_channels_pallas(
        scene, cam, dataclasses.replace(cfg, seed=7), frame=0, interpret=True
    )
    assert not np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    a2 = render_channels_pallas(scene, cam, cfg, frame=0, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))  # deterministic


def test_nee_matches_jnp_backend():
    """NEE in the megakernel vs the jnp path on the same lattice: exact at
    bounce 0 (deterministic shadow ray); multi-bounce allows isolated
    shadow-boundary flips from fp trajectory divergence."""
    from pathtrace_tpu.render import _render_aovs_jnp, pack_channels

    scene, cam = cornell_box(), Camera.create()
    cfg = RenderConfig(
        width=128, height=16, spp=1, max_bounces=1, nee=True,
        backend="jnp", jitter=False,
    )
    jb = np.asarray(pack_channels(_render_aovs_jnp(scene, cam, cfg, 0)))
    pb = np.asarray(render_channels_pallas(scene, cam, cfg, 0, interpret=True))
    np.testing.assert_allclose(jb[..., 0:3], pb[..., 0:3], atol=5e-4)
    # NEE actually contributes (direct light on the floor).
    off = dataclasses.replace(cfg, nee=False)
    jb_off = np.asarray(pack_channels(_render_aovs_jnp(scene, cam, off, 0)))
    assert np.abs(jb[..., 0:3] - jb_off[..., 0:3]).max() > 0.05

    cfg3 = dataclasses.replace(cfg, spp=4, max_bounces=3, jitter=None)
    jb3 = np.asarray(pack_channels(_render_aovs_jnp(scene, cam, cfg3, 0)))
    pb3 = np.asarray(render_channels_pallas(scene, cam, cfg3, 0, interpret=True))
    d = np.abs(jb3[..., 0:3] - pb3[..., 0:3])
    assert float((d > 0.01).mean()) < 0.005
    assert float(d.mean()) < 1e-3


def test_pallas_grads_reject_nee_and_glossy():
    import pytest

    import jax.numpy as jnp

    from pathtrace_tpu.ops.pallas_grad import fused_loss_grads_pallas

    scene, cam = cornell_box(), Camera.create()
    tgt = jnp.zeros((8, 128, 3), jnp.float32)
    for bad in (
        RenderConfig(width=128, height=8, spp=1, nee=True),
        RenderConfig(width=128, height=8, spp=1, brdf="glossy"),
    ):
        with pytest.raises(NotImplementedError):
            fused_loss_grads_pallas(scene, cam, bad, 0, tgt, interpret=True)
