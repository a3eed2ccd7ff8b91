"""Vectorized wavefront tracer vs the scalar NumPy oracle, same uniforms."""

import jax.numpy as jnp
import numpy as np

from pathtrace_tpu.ops.sampling import cosine_weighted_direction, ortho_vector
from pathtrace_tpu.ops.trace import trace_paths

MAX_BOUNCES = 5


def test_ortho_vector_is_orthogonal():
    rng = np.random.default_rng(3)
    v = rng.normal(size=(64, 3)).astype(np.float32)
    o = np.asarray(ortho_vector(jnp.asarray(v)))
    dots = np.sum(o * v, axis=-1)
    np.testing.assert_allclose(dots, 0.0, atol=1e-4)


def test_cosine_sampling_distribution():
    """z = n.d should follow pdf 2z on [0,1] (cosine-weighted): E[z] = 2/3."""
    n = jnp.array([0.0, 0.0, 1.0])
    rng = np.random.default_rng(7)
    u1 = jnp.asarray(rng.uniform(size=200_000).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=200_000).astype(np.float32))
    d = cosine_weighted_direction(jnp.broadcast_to(n, (200_000, 3)), u1, u2)
    z = np.asarray(d[:, 2])
    assert abs(z.mean() - 2.0 / 3.0) < 2e-3
    assert abs((z**2).mean() - 0.5) < 2e-3  # E[z^2] = 1/2 for pdf 2z
    norms = np.linalg.norm(np.asarray(d), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_trace_matches_scalar_oracle(scene):
    from oracle import trace_path as oracle_trace

    rng = np.random.default_rng(11)
    n_rays = 48
    origin = np.float32([50.0, 52.0, 295.6])
    # Rays toward the box interior with some spread.
    dirs = rng.normal([0, 0, -1.0], 0.35, size=(n_rays, 3)).astype(np.float32)
    uniforms = rng.uniform(size=(n_rays, 2 * MAX_BOUNCES)).astype(np.float32)

    res = trace_paths(
        scene,
        jnp.broadcast_to(jnp.asarray(origin), (n_rays, 3)),
        jnp.asarray(dirs),
        jnp.asarray(uniforms),
        max_bounces=MAX_BOUNCES,
    )
    mismatched = 0
    for i in range(n_rays):
        o = oracle_trace(scene, origin, dirs[i], uniforms[i], MAX_BOUNCES)
        np.testing.assert_allclose(
            np.asarray(res.color[i]), o["color"], rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(res.normal[i]), o["normal"], rtol=1e-3, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(res.albedo[i]), o["albedo"], rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            float(res.depth[i]), o["depth"], rtol=1e-3, atol=1e-3
        )
        assert bool(res.hit0[i]) == o["hit0"]
        mismatched += bool(res.include_color[i]) != o["include_color"]
    assert mismatched == 0


def test_first_bounce_emission_clamp(scene):
    """A primary ray straight at the light must clamp emission (4,3.6,3.2)
    to (1,1,1) — the reference's anti-aliasing hack (pathtrace.cu:170-174)."""
    light_pos = np.asarray(scene.position[8])
    origin = np.float32([50.0, 52.0, 81.6])
    direction = (light_pos - origin).astype(np.float32)
    uniforms = np.full((1, 2 * MAX_BOUNCES), 0.5, np.float32)
    res = trace_paths(
        scene,
        jnp.asarray(origin)[None],
        jnp.asarray(direction)[None],
        jnp.asarray(uniforms),
    )
    # First hit is the light: clamped to 1; later bounces add mask*emission
    # but mask *= light.color == 0 kills everything after.
    np.testing.assert_allclose(np.asarray(res.color[0]), [1.0, 1.0, 1.0], atol=1e-5)


def test_escape_path_excluded_from_color_variance(scene):
    """A ray pointing away from every sphere escapes... except the Cornell
    box encloses everything; use an empty-ish scene slice instead."""
    from pathtrace_tpu.scene import Scene

    tiny = Scene(
        radius=[1.0],
        position=[(0.0, 0.0, -5.0)],
        emission=[[0.1, 0.1, 0.1]],
        color=[[0.5, 0.5, 0.5]],
    )
    uniforms = np.full((2, 2 * MAX_BOUNCES), 0.5, np.float32)
    origins = jnp.zeros((2, 3))
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]], jnp.float32)
    res = trace_paths(tiny, origins, dirs, jnp.asarray(uniforms))
    assert not bool(res.include_color[0])  # escaped at bounce 0
    assert not bool(res.hit0[0])
    assert bool(res.hit0[1])


class TestGlossyBRDF:
    """The reference's commented-out glossy experiment (pathtrace.cu:181-184)
    as a working RenderConfig option."""

    def test_reflect(self):
        from pathtrace_tpu.ops.sampling import reflect

        n = jnp.asarray([0.0, 1.0, 0.0])
        d = jnp.asarray([1.0, -1.0, 0.0]) / np.sqrt(2.0)
        r = reflect(d, n)
        np.testing.assert_allclose(
            np.asarray(r), np.asarray([1.0, 1.0, 0.0]) / np.sqrt(2.0), atol=1e-6
        )

    def test_glossy_direction_unit_and_mirror_lobed(self):
        from pathtrace_tpu.ops.sampling import glossy_direction, reflect

        rng = np.random.default_rng(0)
        n = jnp.asarray([0.0, 0.0, 1.0])
        u = [jnp.asarray(rng.uniform(size=512), jnp.float32) for _ in range(5)]
        d = glossy_direction(jnp.broadcast_to(n, (512, 3)), *u)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(d, axis=-1)), 1.0, atol=1e-5
        )
        # Reflecting a cosine lobe about the normal sends it into the
        # OPPOSITE hemisphere (mean z < 0): mirror-like, unlike diffuse.
        assert float(jnp.mean(d[:, 2])) < -0.3

    def test_glossy_render_differs_and_is_finite(self, scene):
        import dataclasses

        from pathtrace_tpu import Camera, RenderConfig
        from pathtrace_tpu.render import render_aovs

        cam = Camera.create()
        # jitter off: the glossy lattice has a different slot stride, so
        # jittered primary rays (and thus bounce-0 AOVs) would not line up.
        cfg = RenderConfig(
            width=64, height=64, spp=2, backend="jnp", brdf="glossy", jitter=False
        )
        aovs = render_aovs(scene, cam, cfg)
        assert np.isfinite(np.asarray(aovs["color"])).all()
        diffuse = render_aovs(scene, cam, dataclasses.replace(cfg, brdf="diffuse"))
        # Bounce-0 AOVs are BRDF-independent; color is not.
        np.testing.assert_allclose(
            np.asarray(aovs["albedo"]), np.asarray(diffuse["albedo"]), atol=1e-6
        )
        assert float(jnp.abs(aovs["color"] - diffuse["color"]).max()) > 1e-3
