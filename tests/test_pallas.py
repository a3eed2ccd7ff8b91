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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_glossy_matches_jnp_backend():
    """Glossy BRDF in the megakernel vs the jnp path on the same 5-slot
    lattice (VERDICT round-1 item #3): both backends renormalize/reflect/
    perturb identically, so images agree up to isolated fp silhouette
    flips from trajectory divergence."""
    from pathtrace_tpu.render import _render_aovs_jnp, pack_channels

    scene, cam = cornell_box(), Camera.create()
    cfg = RenderConfig(
        width=128, height=16, spp=4, max_bounces=3, brdf="glossy", backend="jnp"
    )
    jb = np.asarray(pack_channels(_render_aovs_jnp(scene, cam, cfg, 0)))
    pb = np.asarray(render_channels_pallas(scene, cam, cfg, 0, interpret=True))
    d = np.abs(jb[..., 0:3] - pb[..., 0:3])
    assert float((d > 0.01).mean()) < 0.005
    assert float(d.mean()) < 1e-3
    # Glossy actually differs from diffuse on this scene.
    diff_cfg = dataclasses.replace(cfg, brdf="diffuse")
    db = np.asarray(pack_channels(_render_aovs_jnp(scene, cam, diff_cfg, 0)))
    assert np.abs(jb[..., 0:3] - db[..., 0:3]).max() > 0.05


def test_sample_offset_slices_global_lattice():
    """row/sample offsets address the global lattice: a slab render at
    row_offset r equals rows [r, r+local_h) of the full-frame render."""
    import jax

    from pathtrace_tpu.ops.pallas_trace import accumulate_frame_pallas, render_partials_pallas

    scene, cam = cornell_box(), Camera.create()
    cfg = RenderConfig(width=128, height=32, spp=2, max_bounces=2)
    s_full, m_full = render_partials_pallas(scene, cam, cfg, 0, 0, interpret=True)
    slab = jax.jit(
        lambda s, c: accumulate_frame_pallas(
            s, c, cfg, 0, row_offset=16, local_h=16, interpret=True
        )
    )(scene, cam)
    s_slab, m_slab = slab
    np.testing.assert_array_equal(
        np.asarray(s_slab["color"]), np.asarray(s_full["color"][16:32])
    )
    np.testing.assert_array_equal(
        np.asarray(m_slab["depth"].m2), np.asarray(m_full["depth"].m2[16:32])
    )


@pytest.mark.slow
def test_partials_match_jnp_accumulate():
    """emit_partials mode: raw sums + Welford Moments from the megakernel
    must match render.accumulate_frame on the same lattice (up to isolated
    fp trajectory flips), and Chan-merge across two pallas batches must
    equal one monolithic batch."""
    from pathtrace_tpu.ops.pallas_trace import render_partials_pallas
    from pathtrace_tpu.ops.variance import merge_moments
    from pathtrace_tpu.render import accumulate_frame

    scene, cam = cornell_box(), Camera.create()
    cfg_j = RenderConfig(width=128, height=16, spp=4, max_bounces=3, backend="jnp")
    cfg_p = dataclasses.replace(cfg_j, backend="pallas")
    s_j, m_j = accumulate_frame(scene, cam, cfg_j, 0)
    s_p, m_p = render_partials_pallas(scene, cam, cfg_p, 0, 0, interpret=True)
    # Identical lattice: agreement everywhere except (rarely) a pixel whose
    # fp trajectory flips at a silhouette.
    for k in s_j:
        d = np.abs(np.asarray(s_p[k]) - np.asarray(s_j[k]))
        scale = max(float(np.abs(np.asarray(s_j[k])).max()), 1e-6)
        assert float((d > 1e-3 * scale).mean()) < 0.005, k
    np.testing.assert_array_equal(np.asarray(m_p["color"].n), np.asarray(m_j["color"].n))

    # Associative merge: 2+2 spp pallas batches == 4 spp pallas batch.
    half = dataclasses.replace(cfg_p, spp=2)
    s_a, m_a = render_partials_pallas(scene, cam, half, 0, 0, interpret=True)
    s_b, m_b = render_partials_pallas(scene, cam, half, 0, 2, interpret=True)
    for k in s_a:
        np.testing.assert_allclose(
            np.asarray(s_a[k] + s_b[k]), np.asarray(s_p[k]), rtol=1e-5, atol=1e-4
        )
    merged = merge_moments(m_a["color"], m_b["color"])
    np.testing.assert_allclose(
        np.asarray(merged.m2), np.asarray(m_p["color"].m2), rtol=1e-4, atol=1e-4
    )


def test_generic_interpreter_matches_mosaic_interpreter(scene, camera):
    """interpret="jax" (the generic Pallas interpreter — required under a
    multi-process runtime where the Mosaic interpreter deadlocks,
    tests/multihost_worker.py) must stay bit-identical to interpret=True."""
    cam = camera
    cfg = RenderConfig(width=16, height=16, spp=2, max_bounces=2, backend="pallas")
    a = np.asarray(render_channels_pallas(scene, cam, cfg, 0, interpret=True))
    b = np.asarray(render_channels_pallas(scene, cam, cfg, 0, interpret="jax"))
    np.testing.assert_array_equal(a, b)
