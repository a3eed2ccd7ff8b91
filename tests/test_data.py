"""Data pipeline: importance-sampled patches + in-process pair collection."""

import numpy as np
import pytest

from pathtrace_tpu import RenderConfig, cornell_box
from pathtrace_tpu.data.collect import collect_dataset, load_poses, random_pose, render_pair
from pathtrace_tpu.data.patches import get_patches, patch_score


def test_patch_score_prefers_high_variance():
    flat = np.zeros((8, 8, 14), np.float32)
    noisy = flat.copy()
    noisy[..., 0:6] = np.random.default_rng(0).normal(size=(8, 8, 6))
    assert patch_score(noisy) > patch_score(flat)


def test_get_patches_shapes_and_alignment():
    rng = np.random.default_rng(1)
    data = rng.uniform(size=(64, 64, 14)).astype(np.float32)
    gt = data[..., :3] * 2.0
    px, py = get_patches(data, gt, patch_size=16, num_patches=5, rng=rng)
    assert px.shape == (5, 16, 16, 14)
    assert py.shape == (5, 16, 16, 3)
    # Alignment: gt patch is exactly 2x the color channels of its input.
    np.testing.assert_allclose(py, px[..., :3] * 2.0, rtol=1e-6)


def test_get_patches_importance_bias():
    """Patches from the high-variance half must dominate the selection."""
    rng = np.random.default_rng(2)
    data = np.zeros((64, 128, 14), np.float32)
    data[:, 64:, 0:6] = rng.normal(size=(64, 64, 6))  # right half noisy
    gt = data[..., :3]
    px, _ = get_patches(data, gt, patch_size=8, num_patches=40, rng=rng)
    noisy_fraction = np.mean([patch_score(p) > 1e-8 for p in px])
    assert noisy_fraction > 0.8


def test_patch_too_large_raises():
    with pytest.raises(ValueError, match="smaller than patch"):
        get_patches(np.zeros((8, 8, 14)), np.zeros((8, 8, 3)), patch_size=8,
                    num_patches=1)


def test_random_pose_ranges():
    rng = np.random.default_rng(3)
    for _ in range(20):
        x, y, z, yaw, pitch = random_pose(rng)
        assert 0 <= x <= 90 and 0 <= y <= 175 and 0 <= z <= 500
        assert 0 <= yaw <= 360 and -89 <= pitch <= 89


@pytest.mark.slow
def test_render_pair_and_exr_export(tmp_path):
    scene = cornell_box()
    cfg = RenderConfig(width=24, height=24, spp=1, backend="jnp")
    pose = (50.0, 52.0, 295.6, -90.0, 0.0)
    noisy, gt = render_pair(scene, pose, cfg, spp_train=2, spp_gt=16)
    assert noisy.shape == (24, 24, 14) and gt.shape == (24, 24, 14)
    # gt uses more samples -> its color MEAN is less noisy; compare both
    # against a high-spp reference of the same pose.
    from pathtrace_tpu.camera import Camera as Cam
    import dataclasses as dc

    ref = np.asarray(
        render_pair(scene, pose, cfg, spp_train=2, spp_gt=64)[1][..., 0:3]
    )
    err_noisy = np.abs(noisy[..., 0:3] - ref).mean()
    err_gt = np.abs(gt[..., 0:3] - ref).mean()
    assert err_gt < err_noisy

    collect_dataset(scene, [pose], cfg, spp_train=1, spp_gt=2,
                    save_dir=str(tmp_path))
    assert (tmp_path / "0_train.exr").exists()
    assert (tmp_path / "0_gt.exr").exists()


def test_load_poses(tmp_path):
    p = tmp_path / "poses.txt"
    p.write_text("50 52 295.6 -90 0\n10 20 30 40 -5\n")
    poses = load_poses(str(p))
    assert poses.shape == (2, 5)
    assert poses[1, 4] == -5
