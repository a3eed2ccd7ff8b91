"""Full-frame rendering tests: statistics, chunk invariance, image sanity."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu import Camera, RenderConfig, cornell_box
from pathtrace_tpu.render import (
    pack_channels,
    primary_rays,
    render_aovs,
    render_channels,
    unpack_channels,
)


def test_render_shapes(scene, camera, small_cfg):
    aovs = render_aovs(scene, camera, small_cfg)
    h, w = small_cfg.height, small_cfg.width
    assert aovs["color"].shape == (h, w, 3)
    assert aovs["normal"].shape == (h, w, 3)
    assert aovs["albedo"].shape == (h, w, 3)
    assert aovs["depth"].shape == (h, w)
    for k in ("color_var", "normal_var", "albedo_var", "depth_var"):
        assert aovs[k].shape == (h, w)
    buf = pack_channels(aovs)
    assert buf.shape == (h, w, 14)
    rt = unpack_channels(buf)
    np.testing.assert_array_equal(np.asarray(rt["depth"]), np.asarray(aovs["depth"]))


def test_render_statistics(scene, camera, small_cfg):
    """Sanity of the default view: everything hits (closed box), light at
    top of image, red wall left / blue wall right, depth positive."""
    aovs = render_aovs(scene, camera, small_cfg)
    color = np.asarray(aovs["color"])
    albedo = np.asarray(aovs["albedo"])
    depth = np.asarray(aovs["depth"])
    normal = np.asarray(aovs["normal"])

    assert np.all(np.isfinite(color))
    assert color.mean() > 0.02  # lit scene
    assert np.all(depth > 0)  # camera inside the closed box: all rays hit
    # Mean normals have at most unit norm; pixels straddling silhouettes /
    # box edges average distinct normals and shrink.
    norms = np.linalg.norm(normal, axis=-1)
    assert norms.max() <= 1.0 + 1e-4
    assert (norms > 0.5).mean() > 0.95
    # Left third is the red wall, right third the blue wall (albedo AOV is
    # noise-free geometry, robust even at 4 spp).
    left = albedo[:, :8].reshape(-1, 3).mean(axis=0)
    right = albedo[:, -8:].reshape(-1, 3).mean(axis=0)
    assert left[0] > left[2]  # red dominant
    assert right[2] > right[0]  # blue dominant
    # The light (the only zero-albedo object) is visible in the upper half
    # of the frame, and its directly-seen color is the clamped (1,1,1)
    # (first-bounce emission clamp, pathtrace.cu:170-174).
    light_mask = albedo.sum(-1) < 1e-6
    light_rows = np.where(light_mask.any(axis=1))[0]
    assert light_rows.size > 0
    assert light_rows.max() < small_cfg.height // 2
    # Pure light pixels (not straddling the edge): all samples hit the light.
    pure = light_mask & (np.asarray(aovs["albedo_var"]) == 0)
    assert pure.any()
    np.testing.assert_allclose(color[pure], 1.0, atol=1e-5)


def test_spp_chunking_invariance(scene, camera):
    base = RenderConfig(width=32, height=32, spp=8, backend="jnp", seed=3)
    chunked = dataclasses.replace(base, spp_chunk=3)
    a = render_channels(scene, camera, base)
    b = render_channels(scene, camera, chunked)
    # Chan merges reassociate float sums; tolerances cover rounding noise on
    # near-zero variance channels.
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-3)


def test_no_jitter_when_spp1(scene, camera):
    """spp=1 disables jitter (reference pathtrace.cu:222) -> two renders with
    different seeds agree on geometry channels exactly."""
    cfg_a = RenderConfig(width=32, height=32, spp=1, backend="jnp", seed=0)
    cfg_b = dataclasses.replace(cfg_a, seed=9)
    a = render_aovs(scene, camera, cfg_a)
    b = render_aovs(scene, camera, cfg_b)
    np.testing.assert_array_equal(np.asarray(a["depth"]), np.asarray(b["depth"]))
    np.testing.assert_array_equal(np.asarray(a["albedo"]), np.asarray(b["albedo"]))


def test_variance_channels_nonnegative(scene, camera, small_cfg):
    aovs = render_aovs(scene, camera, small_cfg)
    for k in ("color_var", "normal_var", "albedo_var", "depth_var"):
        assert np.all(np.asarray(aovs[k]) >= 0), k


def test_spp1_variances_zero(scene, camera):
    cfg = RenderConfig(width=16, height=16, spp=1, backend="jnp")
    aovs = render_aovs(scene, camera, cfg)
    for k in ("color_var", "normal_var", "albedo_var", "depth_var"):
        np.testing.assert_array_equal(np.asarray(aovs[k]), 0.0), k


def test_frame_changes_rng(scene, camera, small_cfg):
    a = render_aovs(scene, camera, small_cfg, frame=0)
    b = render_aovs(scene, camera, small_cfg, frame=1)
    assert not np.array_equal(np.asarray(a["color"]), np.asarray(b["color"]))


def test_primary_rays_shapes(camera):
    cfg = RenderConfig(width=32, height=16, spp=1, backend="jnp")
    origin, dirs = primary_rays(camera, cfg)
    assert dirs.shape == (16, 32, 3)
    assert origin.shape == (3,)


def test_convergence_toward_high_spp(scene, camera):
    """Low- and high-spp renders must agree in the mean (MC consistency)."""
    lo = render_aovs(
        scene, camera, RenderConfig(width=16, height=16, spp=32, backend="jnp")
    )
    hi = render_aovs(
        scene, camera, RenderConfig(width=16, height=16, spp=256, backend="jnp")
    )
    diff = np.abs(np.asarray(lo["color"]) - np.asarray(hi["color"])).mean()
    assert diff < 0.08
