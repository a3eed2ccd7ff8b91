"""Camera math tests: lookAt/perspective/unprojection against NumPy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.camera import Camera, pixel_ndc, ray_directions


def np_look_at(eye, center, up):
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4)
    m[0, :3], m[1, :3], m[2, :3] = s, u, -f
    m[0, 3], m[1, 3], m[2, 3] = -s @ eye, -u @ eye, f @ eye
    return m


def test_view_matrix_matches_lookat():
    cam = Camera.create(position=(1.0, 2.0, 3.0), yaw=-35.0, pitch=10.0)
    front, _, up = cam.basis_vectors()
    eye = np.array([1.0, 2.0, 3.0])
    expected = np_look_at(eye, eye + np.asarray(front), np.asarray(up))
    np.testing.assert_allclose(np.asarray(cam.view_matrix()), expected, atol=1e-5)


def test_default_front_is_minus_z():
    cam = Camera.create()
    front, right, up = cam.basis_vectors()
    np.testing.assert_allclose(np.asarray(front), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(right), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(up), [0, 1, 0], atol=1e-6)


def test_center_ray_points_front():
    cam = Camera.create(yaw=-120.0, pitch=-15.0)
    basis = cam.eye_ray_basis(128, 128)
    center = np.asarray(basis).mean(axis=0)
    center /= np.linalg.norm(center)
    front, _, _ = cam.basis_vectors()
    np.testing.assert_allclose(center, np.asarray(front), atol=1e-4)


def test_corner_rays_symmetric_fov():
    cam = Camera.create()
    basis = np.asarray(cam.eye_ray_basis(256, 256))
    # 45 deg vertical fov: angle between top and bottom edge-center rays.
    bottom = (basis[0] + basis[1]) / 2
    top = (basis[2] + basis[3]) / 2
    cos = bottom @ top / (np.linalg.norm(bottom) * np.linalg.norm(top))
    assert np.degrees(np.arccos(cos)) == pytest.approx(45.0, abs=0.1)


def test_ray_direction_orientation():
    """Row 0 is the top of the image (+y world for a -z-facing camera),
    col 0 the left (-x world)."""
    cam = Camera.create()  # looking down -z
    basis = cam.eye_ray_basis(64, 64)
    rows = jnp.array([[0.0, 0.0], [63.0, 63.0]])
    cols = jnp.array([[0.0, 63.0], [0.0, 63.0]])
    ndc_x, ndc_y = pixel_ndc(rows, cols, 64, 64)
    d = np.asarray(ray_directions(basis, ndc_x, ndc_y))
    assert d[0, 0, 1] > 0 and d[1, 0, 1] < 0  # top row points up
    assert d[0, 0, 0] < 0 and d[0, 1, 0] > 0  # left col points -x


def test_unprojection_consistency():
    """The bilinear-interpolated ray through any pixel must pass through the
    unprojection of that pixel's NDC point (corner rays all live in the
    z=0 clip plane, which bilinear interpolation parameterizes exactly for
    the x-y corners)."""
    cam = Camera.create(position=(10.0, 20.0, 30.0), yaw=-70.0, pitch=5.0)
    w = h = 128
    inv_vp = np.linalg.inv(
        np.asarray(Camera.projection_matrix(w, h)) @ np.asarray(cam.view_matrix())
    )
    basis = cam.eye_ray_basis(w, h)
    for r, c in [(0, 0), (64, 64), (13, 101)]:
        ndc_x, ndc_y = pixel_ndc(jnp.float32(r), jnp.float32(c), w, h)
        d = np.asarray(ray_directions(basis, jnp.array(ndc_x), jnp.array(ndc_y)))
        p = inv_vp @ np.array([float(ndc_x), float(ndc_y), 0.0, 1.0])
        p = p[:3] / p[3]
        expected = p - np.asarray(cam.position)
        np.testing.assert_allclose(d, expected, rtol=2e-3, atol=2e-3)


def test_camera_pose_differentiable():
    cam = Camera.create()

    def f(pos):
        c = Camera(position=pos, yaw=cam.yaw, pitch=cam.pitch)
        return jnp.sum(c.eye_ray_basis(32, 32) ** 2)

    g = jax.grad(f)(cam.position)
    assert np.all(np.isfinite(np.asarray(g)))


def test_movement_and_look():
    cam = Camera.create()
    moved = cam.move("forward", 0.1)  # SPEED=50 -> 5 units along -z
    np.testing.assert_allclose(
        np.asarray(moved.position), [50.0, 52.0, 290.6], atol=1e-4
    )
    looked = cam.look(4.0, 100.0)  # pitch clamps at 89
    assert float(looked.yaw) == pytest.approx(-90.0 + 4.0 * 1.25)
    assert float(looked.pitch) == pytest.approx(89.0)
