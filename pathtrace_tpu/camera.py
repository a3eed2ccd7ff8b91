"""FPS camera: pose -> eye-ray basis, plus movement semantics.

Re-derives the reference camera exactly (``include/Camera.h``): a
learnopengl.com-style yaw/pitch camera whose ``getEyeRayBasis``
(``Camera.h:125-149``) unprojects the four NDC corners at clip z=0 through
``inverse(perspective(45deg) * lookAt)`` and subtracts the eye position,
producing four corner ray directions that the renderer bilinearly
interpolates per pixel.

Everything is ``jnp`` and differentiable, so camera-pose gradients flow
through the ray basis into the path tracer.

Orientation note: the reference's kernel indexes the buffer as
``buf[x*W*14 + y*14 + c]`` with ray NDC ``(2*y/H - 1, 1 - 2*x/W)``
(``src/pathtrace.cu:226-229``, the ``1-screenPos.x`` flip), which makes the
*final saved image* a normal top-down raster: row = kernel x, col = kernel y,
row 0 at the top, col 0 at the left. This module exposes the clean
convention directly: for image pixel (row r, col c),
``ndc_x = 2*c/W - 1`` and ``ndc_y = 1 - 2*r/H`` — bit-identical ray
directions to the reference's final image layout.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

# Defaults from reference include/Camera.h:28-32.
DEFAULT_YAW = -90.0
DEFAULT_PITCH = 0.0
SPEED = 50.0
SENSITIVITY = 1.25
ZOOM = 45.0  # vertical fov in degrees
NEAR = 0.01
FAR = 1000.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Camera pose. ``position`` is [3]; yaw/pitch are degrees (scalars)."""

    position: jnp.ndarray
    yaw: jnp.ndarray
    pitch: jnp.ndarray

    @staticmethod
    def create(position=(50.0, 52.0, 295.6), yaw=DEFAULT_YAW, pitch=DEFAULT_PITCH):
        """Defaults are the reference CLI defaults (src/main.cu:24-25)."""
        return Camera(
            position=jnp.asarray(position, jnp.float32),
            yaw=jnp.asarray(yaw, jnp.float32),
            pitch=jnp.asarray(pitch, jnp.float32),
        )

    # -- basis vectors (Camera.h:153-164) -----------------------------------
    def basis_vectors(self):
        """Returns (front, right, up), world-up = +Y."""
        yaw = jnp.deg2rad(self.yaw)
        pitch = jnp.deg2rad(self.pitch)
        front = jnp.stack(
            [
                jnp.cos(yaw) * jnp.cos(pitch),
                jnp.sin(pitch),
                jnp.sin(yaw) * jnp.cos(pitch),
            ]
        )
        front = front / jnp.linalg.norm(front)
        world_up = jnp.array([0.0, 1.0, 0.0], self.position.dtype)
        right = jnp.cross(front, world_up)
        right = right / jnp.linalg.norm(right)
        up = jnp.cross(right, front)
        up = up / jnp.linalg.norm(up)
        return front, right, up

    def view_matrix(self) -> jnp.ndarray:
        """glm::lookAt(position, position + front, up) (Camera.h:74)."""
        front, right, up = self.basis_vectors()
        eye = self.position
        m = jnp.eye(4, dtype=jnp.float32)
        m = m.at[0, :3].set(right)
        m = m.at[1, :3].set(up)
        m = m.at[2, :3].set(-front)
        m = m.at[0, 3].set(-jnp.dot(right, eye))
        m = m.at[1, 3].set(-jnp.dot(up, eye))
        m = m.at[2, 3].set(jnp.dot(front, eye))
        return m

    @staticmethod
    def projection_matrix(width: int, height: int) -> jnp.ndarray:
        """glm::perspective(radians(45), w/h, 0.01, 1000) (Camera.h:130)."""
        f = 1.0 / jnp.tan(jnp.deg2rad(jnp.float32(ZOOM)) / 2.0)
        aspect = width / float(height)
        m = jnp.zeros((4, 4), jnp.float32)
        m = m.at[0, 0].set(f / aspect)
        m = m.at[1, 1].set(f)
        m = m.at[2, 2].set(-(FAR + NEAR) / (FAR - NEAR))
        m = m.at[2, 3].set(-2.0 * FAR * NEAR / (FAR - NEAR))
        m = m.at[3, 2].set(-1.0)
        return m

    def inverse_view_matrix(self) -> jnp.ndarray:
        """Analytic inverse of lookAt: [[R^T, eye], [0, 1]]. Far better f32
        conditioning (and cleaner gradients) than jnp.linalg.inv of the
        near/far-skewed view-projection product."""
        front, right, up = self.basis_vectors()
        m = jnp.eye(4, dtype=self.position.dtype)
        m = m.at[:3, 0].set(right)
        m = m.at[:3, 1].set(up)
        m = m.at[:3, 2].set(-front)
        m = m.at[:3, 3].set(self.position)
        return m

    @staticmethod
    def inverse_projection_matrix(width: int, height: int, dtype=jnp.float32) -> jnp.ndarray:
        """Analytic inverse of the perspective matrix."""
        f = 1.0 / jnp.tan(jnp.deg2rad(jnp.asarray(ZOOM, dtype)) / 2.0)
        aspect = width / float(height)
        c = -(FAR + NEAR) / (FAR - NEAR)
        d = -2.0 * FAR * NEAR / (FAR - NEAR)
        m = jnp.zeros((4, 4), dtype)
        m = m.at[0, 0].set(aspect / f)
        m = m.at[1, 1].set(1.0 / f)
        m = m.at[2, 3].set(-1.0)
        m = m.at[3, 2].set(1.0 / d)
        m = m.at[3, 3].set(c / d)
        return m

    def eye_ray_basis(self, width: int, height: int) -> jnp.ndarray:
        """Four corner ray directions, [4, 3]: rows are NDC corners
        (-1,-1), (+1,-1), (-1,+1), (+1,+1) — matching the output order of
        reference ``Camera.h:131-148`` (ray00, ray10, ray01, ray11).

        The rays are NOT normalized (the reference never normalizes the
        primary ray — depth t is measured in units of this basis length).

        Formulated as ``R_view^-1 @ unproject_view(corner)`` rather than the
        reference's ``unproject_world(corner) - eye`` (``Camera.h:131-148``):
        the latter cancels ~|eye|-magnitude terms against each other and
        loses ~1.5e-3 of relative direction accuracy in f32 (enough to
        dither wall depths by tens of basis units under sub-ulp camera
        motion). Identical in exact arithmetic.
        """
        dt = self.position.dtype
        corners = jnp.array(
            [[-1.0, -1.0], [1.0, -1.0], [-1.0, 1.0], [1.0, 1.0]], dt
        )
        ndc = jnp.concatenate(
            [corners, jnp.zeros((4, 1), dt), jnp.ones((4, 1), dt)],
            axis=1,
        )  # [4, 4], clip z = 0 as in the reference
        view = ndc @ self.inverse_projection_matrix(width, height, dt).T  # [4, 4]
        view3 = view[:, :3] / view[:, 3:4]
        rot = self.inverse_view_matrix()[:3, :3]  # world <- view rotation
        return view3 @ rot.T

    # -- interactive-mode semantics (Window.h:133-147, Camera.h:79-112) -----
    def move(self, direction: str, delta_time: float) -> "Camera":
        """WASD movement: direction in {forward, backward, left, right}."""
        front, right, _ = self.basis_vectors()
        v = SPEED * delta_time
        step = {
            "forward": front * v,
            "backward": -front * v,
            "left": -right * v,
            "right": right * v,
        }[direction]
        return dataclasses.replace(self, position=self.position + step)

    def look(self, dx: float, dy: float, constrain_pitch: bool = True) -> "Camera":
        """Mouse look; offsets scaled by SENSITIVITY, pitch clamped to
        [-89, 89] (Camera.h:93-112)."""
        yaw = self.yaw + dx * SENSITIVITY
        pitch = self.pitch + dy * SENSITIVITY
        if constrain_pitch:
            pitch = jnp.clip(pitch, -89.0, 89.0)
        return dataclasses.replace(self, yaw=yaw, pitch=pitch)

    @staticmethod
    def scroll_zoom(zoom: float, y_offset: float) -> float:
        """Mouse-wheel zoom clamped to [1, 45] (Camera.h:116-123).
        Faithfully useless: the reference's ray basis hard-codes a 45-deg
        fov (Camera.h:130) and never reads Zoom — preserved as-is."""
        if 1.0 <= zoom <= 45.0:
            zoom -= y_offset
        return min(max(zoom, 1.0), 45.0)

    def pose_string(self) -> str:
        """The SPACE-key camera dump (Window.h:155-158): x y z yaw pitch."""
        p = [float(v) for v in self.position]
        return f"{p[0]} {p[1]} {p[2]} {float(self.yaw)} {float(self.pitch)}"


def pixel_ndc(rows, cols, width: int, height: int):
    """Image pixel coordinates -> NDC.

    ``rows``/``cols`` may carry sub-pixel jitter. Matches the reference's
    sampling lattice: pixel (r, c) maps to the corner-anchored position
    ``(c/W, r/H)`` of the bilinear basis lerp (``src/pathtrace.cu:226-229``
    uses the raw integer pixel index, no +0.5 center offset).
    """
    ndc_x = 2.0 * cols / width - 1.0
    ndc_y = 1.0 - 2.0 * rows / height
    return ndc_x, ndc_y


def ray_directions(basis: jnp.ndarray, ndc_x, ndc_y):
    """Bilinearly interpolate the 4-corner basis at NDC positions.

    basis rows: 0:(-1,-1) 1:(+1,-1) 2:(-1,+1) 3:(+1,+1). Weights:
    u = (ndc_x+1)/2 along x, v = (ndc_y+1)/2 along y. Equivalent to the
    reference's nested lerp (``src/pathtrace.cu:229``) after unscrambling its
    axis convention (see module docstring).
    """
    u = (ndc_x + 1.0) * 0.5
    v = (ndc_y + 1.0) * 0.5
    u = u[..., None]
    v = v[..., None]
    bottom = basis[0] * (1.0 - u) + basis[1] * u
    top = basis[2] * (1.0 - u) + basis[3] * u
    return bottom * (1.0 - v) + top * v
