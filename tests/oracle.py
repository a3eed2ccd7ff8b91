"""Scalar NumPy oracle tracer.

A deliberately slow, loop-at-a-time transliteration of the reference
semantics (``/root/reference/src/pathtrace.cu:72-257``) in plain Python
floats, used as the unit-test oracle for the vectorized JAX tracer
(SURVEY.md §4(b)). It consumes the *same* uniform lattice the JAX renderer
draws, so results must agree to f32 tolerance — this is an independent
reimplementation of the math, not a copy of either code path.
"""

import numpy as np

LUMA = np.array([0.2126, 0.7152, 0.0722])


def normalize(v):
    return v / np.linalg.norm(v)


def intersect_sphere(origin, direction, center, radius):
    """Returns (hit, t) with the reference's 'inside hits count' rule."""
    offset = origin - center
    a = direction @ direction
    b = 2.0 * direction @ offset
    c = offset @ offset - radius * radius
    det = b * b - 4 * a * c
    if det < 0:
        return False, 0.0
    sq = np.sqrt(det)
    t_near = (-b - sq) / (2 * a)
    t_far = (-b + sq) / (2 * a)
    if t_near > 0 and t_far > 0:
        t = min(t_near, t_far)
    elif t_near > 0:
        t = t_near
    else:
        t = t_far
    return True, t


def intersect_scene(origin, direction, scene):
    """Nearest positive hit below 1e6; first index wins ties strictly."""
    t_nearest = 1.0e6
    best = None
    for i in range(scene.num_objects):
        hit, t = intersect_sphere(
            origin, direction, np.asarray(scene.position[i]), float(scene.radius[i])
        )
        if hit and t > 0 and t < t_nearest:
            t_nearest = t
            best = i
    if best is None:
        return None
    return best, t_nearest


def cosine_weighted(normal, u1, u2, power=1.0):
    d = normalize(normal)
    if abs(d[0]) > abs(d[2]):
        o1 = normalize(np.array([-d[1], d[0], 0.0]))
    else:
        o1 = normalize(np.array([0.0, -d[2], d[1]]))
    o2 = normalize(np.cross(d, o1))
    phi = u1 * 2 * np.pi
    z = u2 ** (1.0 / (power + 1.0))
    sin_t = np.sqrt(max(1.0 - z * z, 0.0))
    return normalize(np.cos(phi) * sin_t * o1 + np.sin(phi) * sin_t * o2 + z * d)


def trace_path(scene, origin, direction, uniforms, max_bounces=5, push=0.05):
    """Trace one sample. uniforms: [2*max_bounces] bounce draws.

    Returns dict with color, normal, albedo, depth, hit0, include_color.
    """
    origin = np.asarray(origin, np.float64).copy()
    direction = np.asarray(direction, np.float64).copy()
    color = np.zeros(3)
    mask = np.ones(3)
    out = dict(
        color=np.zeros(3),
        normal=np.zeros(3),
        albedo=np.zeros(3),
        depth=0.0,
        hit0=False,
        include_color=False,
    )
    for n in range(max_bounces):
        hit = intersect_scene(origin, direction, scene)
        if hit is None:
            out["color"] = color
            return out  # escape: no color-variance inclusion
        idx, t = hit
        center = np.asarray(scene.position[idx], np.float64)
        pos = origin + direction * t
        normal = normalize(pos - center)
        if normal @ direction >= 0:
            normal = -normal
        emission = np.asarray(scene.emission[idx], np.float64)
        obj_color = np.asarray(scene.color[idx], np.float64)
        if n == 0:
            color = color + np.clip(mask * emission, 0.0, 1.0)
        else:
            color = color + mask * emission
        mask = mask * obj_color
        origin = pos + normal * push
        if n + 1 < max_bounces:
            u1 = float(uniforms[2 * n])
            u2 = float(uniforms[2 * n + 1])
            direction = cosine_weighted(normal, u1, u2)
        if n == 0:
            out["normal"] = normal
            out["albedo"] = obj_color
            out["depth"] = t
            out["hit0"] = True
    out["color"] = color
    out["include_color"] = True
    return out
