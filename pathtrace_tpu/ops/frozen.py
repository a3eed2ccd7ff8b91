"""Frozen-decision record/replay — the gradient-validation oracle.

The differentiable renderer uses the detached-decision convention
(grad.py, SURVEY.md §7 "hard parts" #1): every DISCRETE choice along a
path — which sphere the ray hits, the near/far root of the quadratic, the
normal flip, the ortho-basis branch inside the cosine sampler, the binary
shadow visibility — is an AD constant, while everything continuous
(hit t, normals, the NEE Lambert term, bounce directions) carries
derivatives. By construction, the estimator's gradient at a base point
theta_0 equals d/d theta of the function "trace with the decisions FROZEN
at theta_0".

This module materializes that function. ``record=True`` traces normally
(op-for-op identical to ops/trace.py — asserted bitwise by
tests/test_frozen.py) and records the per-(sample, pixel, bounce)
decisions; replaying with those decisions gives a SMOOTH function of the
105 scene/camera scalars whose value at theta_0 matches the real renderer
exactly and whose derivative IS the detached-decision estimator. Two uses:

1. **Finite-difference oracle** (scripts/grad_gate.py §3): central FD of
   the frozen replay needs no silhouette masking — perturbations cannot
   flip a frozen decision, so the O(1) boundary terms that poison raw-loss
   FD (and leak through per-pixel jump masks at 512^2 x 32 spp, where
   thousands of sub-threshold single-sample reselections slip under any
   threshold) are structurally absent.
2. **Precision oracle**: the replay is dtype-generic — run it in float64
   on CPU with decisions recorded by the f32 renderer and ``jax.grad``
   gives the same estimator with ~1e-16 accumulation error, separating
   genuine gradient bugs from f32 summation noise in the heavy-cancellation
   geometry sums (the r=1e5 wall spheres).

Reference analog of the differentiated physics: ``src/pathtrace.cu:72-201``
(intersection, bounce loop, ``getDirectLighting`` :138-148).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pathtrace_tpu import camera as camera_lib
from pathtrace_tpu import rng
from pathtrace_tpu.config import RenderConfig
from pathtrace_tpu.ops.intersect import T_MAX
from pathtrace_tpu.ops.sampling import (
    _normalize,
    cosine_weighted_direction,
    glossy_direction,
)


class Decisions(NamedTuple):
    """Per-(sample, pixel, bounce) discrete choices, shapes [..., B].

    idx:      int32 — winning sphere, -1 = miss. A miss at bounce n means
              the path escaped (the ray is never updated after a miss, so
              all later bounces record a miss too — ops/trace.py contract).
    use_near: bool — the quadratic root taken (t_near > 0, else t_far).
    facing:   bool — normal kept as outward (dot(n_out, dir) < 0), else
              negated (``pathtrace.cu:164-166``).
    ortho:    bool — the ortho-basis branch |n.x| > |n.z| of the bounce
              direction drawn AT this bounce (``pathtrace.cu:121-124``);
              the last bounce draws no direction, its slot is unused.
    vis:      f32 0/1 — NEE shadow visibility (``pathtrace.cu:109-119``);
              all-ones when NEE is off.
    """

    idx: jnp.ndarray
    use_near: jnp.ndarray
    facing: jnp.ndarray
    ortho: jnp.ndarray
    vis: jnp.ndarray


def _intersect_record(scene, ray_o, dn, inv_len):
    """Running-min nearest hit, op-for-op ops/intersect.py
    ``intersect_scene_select`` plus (idx, use_near) tracking."""
    batch_shape = dn.shape[:-1]
    dt = dn.dtype
    t_best = jnp.full(batch_shape, T_MAX, dt)
    idx = jnp.full(batch_shape, -1, jnp.int32)
    use_near = jnp.zeros(batch_shape, bool)
    center = jnp.zeros(batch_shape + (3,), dt)
    emission = jnp.zeros(batch_shape + (3,), dt)
    color = jnp.zeros(batch_shape + (3,), dt)
    for i in range(scene.num_objects):
        rel = scene.position[i] - ray_o
        tca = jnp.sum(rel * dn, axis=-1)
        perp = rel - tca[..., None] * dn
        d2 = jnp.sum(perp * perp, axis=-1)
        det = scene.radius[i] * scene.radius[i] - d2
        pos_det = det > 0.0
        thc = jnp.where(pos_det, jnp.sqrt(jnp.where(pos_det, det, 1.0)), 0.0)
        near = tca - thc
        t_near = near * inv_len
        t_far = (tca + thc) * inv_len
        take_near = t_near > 0.0
        t = jnp.where(take_near, t_near, t_far)
        valid = (det >= 0.0) & (t > 0.0) & (t < T_MAX)
        closer = valid & (t < t_best)
        t_best = jnp.where(closer, t, t_best)
        idx = jnp.where(closer, i, idx)
        use_near = jnp.where(closer, take_near, use_near)
        c3 = closer[..., None]
        center = jnp.where(c3, jnp.broadcast_to(scene.position[i], center.shape), center)
        emission = jnp.where(
            c3, jnp.broadcast_to(scene.emission[i], emission.shape), emission
        )
        color = jnp.where(c3, jnp.broadcast_to(scene.color[i], color.shape), color)
    return t_best, idx, use_near, center, emission, color


def _intersect_replay(scene, ray_o, dn, inv_len, idx, use_near):
    """The nearest hit with the sphere CHOICE frozen: differentiable t /
    parameters of sphere ``idx``; miss lanes (-1) return inert values
    (masked out downstream exactly as in ops/trace.py)."""
    hit = idx >= 0
    safe = jnp.clip(idx, 0, scene.num_objects - 1)
    center = jnp.take(scene.position, safe, axis=0)
    emission = jnp.take(scene.emission, safe, axis=0)
    color = jnp.take(scene.color, safe, axis=0)
    radius = jnp.take(scene.radius, safe, axis=0)
    rel = center - ray_o
    tca = jnp.sum(rel * dn, axis=-1)
    perp = rel - tca[..., None] * dn
    d2 = jnp.sum(perp * perp, axis=-1)
    det = radius * radius - d2
    # On hit lanes det > 0 strictly at the record point; under perturbation
    # a grazing hit may push det below 0 — clamp keeps the replay defined
    # and continuous (t -> tca there). Double-where keeps AD NaN-free.
    pos_det = det > 0.0
    thc = jnp.where(pos_det, jnp.sqrt(jnp.where(pos_det, det, 1.0)), 0.0)
    t = jnp.where(use_near, tca - thc, tca + thc) * inv_len
    return t, hit, center, emission, color


def _direct_lighting_frozen(scene, normal, position, light_index, push, vis):
    """``ops/sampling.direct_lighting`` with the binary shadow visibility
    supplied from the record (it is piecewise-constant — AD already sees
    zero gradient through it, so freezing changes nothing analytically,
    but keeps FD from stepping across an occlusion flip)."""
    light_bottom = scene.position[light_index] - jnp.stack(
        [
            jnp.zeros_like(scene.radius[light_index]),
            scene.radius[light_index],
            jnp.zeros_like(scene.radius[light_index]),
        ]
    )
    light_dir = _normalize(light_bottom - position)
    diffuse = jnp.clip(jnp.sum(light_dir * normal, axis=-1), 0.0, 1.0)
    return (diffuse * vis)[..., None] * scene.emission[light_index]


def frozen_trace(
    scene,
    origin,
    direction,
    bounce_uniforms,
    decisions: Decisions | None = None,
    max_bounces: int = 5,
    push_ray_origin: float = 0.05,
    nee_light_index: int | None = None,
    brdf: str = "diffuse",
):
    """Trace primary rays; returns (color [..., 3], Decisions).

    With ``decisions=None`` this records: the forward math mirrors
    ops/trace.py ``trace_paths`` op-for-op (bitwise-equal color, asserted
    by tests/test_frozen.py) while capturing every discrete choice. With
    decisions given, those choices are frozen and the trace is a smooth
    function of scene/camera parameters.
    """
    record = decisions is None
    batch_shape = direction.shape[:-1]
    dt = direction.dtype
    origin = jnp.broadcast_to(origin, direction.shape).astype(dt)

    color = jnp.zeros(batch_shape + (3,), dt)
    mask = jnp.ones(batch_shape + (3,), dt)
    active = jnp.ones(batch_shape, bool)
    ray_o, ray_d = origin, direction

    rec = {k: [] for k in Decisions._fields}

    for n in range(max_bounces):
        inv_len = jax.lax.rsqrt(jnp.sum(ray_d * ray_d, axis=-1))
        dn = ray_d * inv_len[..., None]
        if record:
            t, idx, use_near, center, emission, obj_color = _intersect_record(
                scene, ray_o, dn, inv_len
            )
            hit = idx >= 0
        else:
            idx = decisions.idx[..., n]
            use_near = decisions.use_near[..., n]
            t, hit, center, emission, obj_color = _intersect_replay(
                scene, ray_o, dn, inv_len, idx, use_near
            )
        hit_now = active & hit

        pos = ray_o + ray_d * t[..., None]
        normal_out = _normalize(pos - center)
        if record:
            facing = jnp.sum(normal_out * ray_d, axis=-1) < 0.0
        else:
            facing = decisions.facing[..., n]
        normal = jnp.where(facing[..., None], normal_out, -normal_out)

        contrib = mask * emission
        if n == 0:
            contrib = jnp.clip(contrib, 0.0, 1.0)  # pathtrace.cu:170-174
        if nee_light_index is not None:
            if record:
                from pathtrace_tpu.ops.intersect import shadow_visibility

                light_bottom = scene.position[nee_light_index] - jnp.stack(
                    [
                        jnp.zeros_like(scene.radius[nee_light_index]),
                        scene.radius[nee_light_index],
                        jnp.zeros_like(scene.radius[nee_light_index]),
                    ]
                )
                light_dir = _normalize(light_bottom - pos)
                vis = shadow_visibility(
                    pos + normal * push_ray_origin, light_dir, scene,
                    nee_light_index,
                )
                diffuse = jnp.clip(jnp.sum(light_dir * normal, axis=-1), 0.0, 1.0)
                dl = (diffuse * vis)[..., None] * scene.emission[nee_light_index]
            else:
                vis = decisions.vis[..., n]
                dl = _direct_lighting_frozen(
                    scene, normal, pos, nee_light_index, push_ray_origin, vis
                )
            contrib = contrib + mask * dl * obj_color * 0.5
        else:
            vis = jnp.ones(batch_shape, dt)
        color = color + jnp.where(hit_now[..., None], contrib, 0.0)
        mask = jnp.where(hit_now[..., None], mask * obj_color, mask)

        if record:
            # The branch the sampler takes internally: computed on the
            # normalized normal, exactly as ortho_vector sees it.
            nrm = _normalize(normal)
            ortho = jnp.abs(nrm[..., 0]) > jnp.abs(nrm[..., 2])
            ortho_arg = None  # record mode runs the sampler's own branch
        else:
            ortho = decisions.ortho[..., n]
            ortho_arg = ortho
        if n + 1 < max_bounces:
            spb = 5 if brdf == "glossy" else 2
            u1 = bounce_uniforms[..., spb * n]
            u2 = bounce_uniforms[..., spb * n + 1]
            if brdf == "glossy":
                new_d = glossy_direction(
                    normal,
                    u1,
                    u2,
                    bounce_uniforms[..., spb * n + 2],
                    bounce_uniforms[..., spb * n + 3],
                    bounce_uniforms[..., spb * n + 4],
                    ortho_cond=ortho_arg,
                )
            else:
                new_d = cosine_weighted_direction(
                    normal, u1, u2, ortho_cond=ortho_arg
                )
            new_o = pos + normal * push_ray_origin
            ray_o = jnp.where(hit_now[..., None], new_o, ray_o)
            ray_d = jnp.where(hit_now[..., None], new_d, ray_d)

        active = active & hit
        if record:
            rec["idx"].append(jnp.where(hit_now, idx, -1))
            rec["use_near"].append(use_near & hit_now)
            rec["facing"].append(facing & hit_now)
            rec["ortho"].append(ortho & hit_now)
            rec["vis"].append(jnp.where(hit_now, vis, 0.0))

    if record:
        decisions = Decisions(
            **{k: jnp.stack(v, axis=-1) for k, v in rec.items()}
        )
    return color, decisions


def _chunk_rays(cam_eye, basis, cfg: RenderConfig, frame, chunk_spp: int,
                sample_offset: int):
    """Primary rays + bounce uniforms for one spp chunk, mirroring
    render.py ``_trace_chunk`` exactly, parameterized by (eye, basis) so
    the replay can run in any dtype. Returns (origin, directions [S,H,W,3],
    bounce_uniforms)."""
    dt = basis.dtype
    uniforms = rng.sample_uniforms(
        cfg.seed,
        frame,
        chunk_spp,
        cfg.height,
        cfg.width,
        cfg.max_bounces,
        sample_offset,
        slots_per_bounce=cfg.slots_per_bounce,
    ).astype(dt)
    jitter_uv = uniforms[..., :2] if cfg.resolved_jitter else None
    bounce_u = uniforms[..., 2:]
    rows = jnp.arange(cfg.height, dtype=dt)[:, None]
    cols = jnp.arange(cfg.width, dtype=dt)[None, :]
    rows = jnp.broadcast_to(rows, (cfg.height, cfg.width))
    cols = jnp.broadcast_to(cols, (cfg.height, cfg.width))
    if jitter_uv is not None:
        rows = rows + (jitter_uv[..., 0] - 0.5)
        cols = cols + (jitter_uv[..., 1] - 0.5)
    ndc_x, ndc_y = camera_lib.pixel_ndc(rows, cols, cfg.width, cfg.height)
    directions = camera_lib.ray_directions(basis, ndc_x, ndc_y)
    if directions.ndim == 3:
        directions = jnp.broadcast_to(
            directions, (chunk_spp, cfg.height, cfg.width, 3)
        )
    return cam_eye.astype(dt), directions, bounce_u


def record_frame(scene, cam, cfg: RenderConfig, frame=0):
    """Trace the full frame in f32 (the real renderer's arithmetic),
    recording decisions per spp chunk. Returns (color [H, W, 3] mean,
    list[Decisions])."""
    eye, basis = cam.position, cam.eye_ray_basis(cfg.width, cfg.height)
    total = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    recs = []
    offset = 0
    for chunk in cfg.chunks():
        o, d, bu = _chunk_rays(eye, basis, cfg, frame, chunk, offset)
        color, dec = frozen_trace(
            scene, o, d, bu,
            max_bounces=cfg.max_bounces,
            push_ray_origin=cfg.push_ray_origin,
            nee_light_index=cfg.light_index if cfg.nee else None,
            brdf=cfg.brdf,
        )
        total = total + jnp.sum(color, axis=0)
        recs.append(jax.tree.map(jax.device_get, dec))
        offset += chunk
    return total / cfg.spp, recs


def replay_color(scene, eye, basis, cfg: RenderConfig, frame, recs,
                 remat: bool = True):
    """Mean color [H, W, 3] of the frozen replay — smooth in (scene, eye,
    basis). dtype follows ``basis`` (cast scene/eye/basis to f64 for the
    precision oracle). ``remat``: checkpoint each chunk (bounds backward
    memory like grad.py)."""
    dt = basis.dtype

    def chunk_color(scene_, eye_, basis_, dec, chunk, offset):
        o, d, bu = _chunk_rays(eye_, basis_, cfg, frame, chunk, offset)
        dec = jax.tree.map(
            lambda x: jnp.asarray(x, dt) if x.dtype.kind == "f" else jnp.asarray(x),
            dec,
        )
        color, _ = frozen_trace(
            scene_, o, d, bu, decisions=Decisions(*dec),
            max_bounces=cfg.max_bounces,
            push_ray_origin=cfg.push_ray_origin,
            nee_light_index=cfg.light_index if cfg.nee else None,
            brdf=cfg.brdf,
        )
        return jnp.sum(color, axis=0)

    if remat:
        chunk_color = jax.checkpoint(chunk_color, static_argnums=(4, 5))

    total = jnp.zeros((cfg.height, cfg.width, 3), dt)
    offset = 0
    for dec, chunk in zip(recs, cfg.chunks()):
        total = total + chunk_color(
            scene, eye, basis, tuple(dec), chunk, offset
        )
        offset += chunk
    return total / cfg.spp


def replay_loss(scene, cam, cfg: RenderConfig, frame, recs, target,
                dtype=jnp.float32):
    """Mean-squared pixel loss of the frozen replay, differentiable in
    (scene, camera) — gradient == the detached-decision estimator at the
    record point. The whole chain, including the camera pose -> eye-ray
    basis math (which is dtype-generic, camera.py), runs in ``dtype``:
    the f64 oracle differentiates the same real-arithmetic function the
    f32 renderer computes, just with ~1e-16 rounding."""
    import dataclasses as _dc

    cam = _dc.replace(
        cam,
        position=cam.position.astype(dtype),
        yaw=cam.yaw.astype(dtype),
        pitch=cam.pitch.astype(dtype),
    )
    eye, basis = cam.position, cam.eye_ray_basis(cfg.width, cfg.height)
    color = replay_color(
        scene.replace(
            radius=scene.radius.astype(dtype),
            position=scene.position.astype(dtype),
            emission=scene.emission.astype(dtype),
            color=scene.color.astype(dtype),
        ),
        eye.astype(dtype),
        basis.astype(dtype),
        cfg,
        frame,
        recs,
    )
    diff = color - target.astype(dtype)
    return jnp.sum(diff * diff) / (cfg.height * cfg.width * 3)


def replay_loss_grads(scene, cam, cfg: RenderConfig, frame, recs, target,
                      dtype=jnp.float32):
    """(loss, (d_scene, d_camera)) of the frozen replay via jax.grad."""
    def f(scene_, cam_):
        return replay_loss(scene_, cam_, cfg, frame, recs, target, dtype=dtype)

    return jax.value_and_grad(f, argnums=(0, 1))(scene, cam)
