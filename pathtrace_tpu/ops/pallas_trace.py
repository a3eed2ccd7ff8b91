"""Pallas TPU megakernel: the fast forward path.

This is the TPU re-design of the reference's ``pixel_kernel``
(``src/pathtrace.cu:203-257``): one Pallas program instance owns an
(8, 128)-aligned image tile held in VMEM, loops all spp in-register, unrolls
the 5-bounce pipeline, and runs the 9-sphere intersection as straight-line
VPU vector code over the whole tile. Sequential per-pixel Welford moments
(the exact reference update, ``pathtrace.cu:39-65``) accumulate in VMEM;
the only HBM traffic is the final (14, TH, TW) channel block per tile —
the kernel is pure-compute-bound by design.

RNG: counter-based in-kernel hashing (two rounds of the 'lowbias32'
integer mixer) keyed on (seed, frame, global sample index, draw slot,
absolute pixel coordinates). Pure VPU integer ops — no sequential state,
so streams are independent of the tiling and of how spp is sharded, and
identical under interpret mode. (The TPU hardware PRNG
``pltpu.prng_random_bits`` was rejected: its streams would depend on the
tile grid, and the Pallas interpreter stubs it to zeros.) The jnp backend
draws from threefry instead; the two backends are statistically — not
bitwise — equivalent, which the moment tests verify.

Scene and camera parameters ride in SMEM and are read as scalars inside
unrolled loops — no HBM loads in the hot path. Everything else matches
ops/trace.py semantics exactly (first-bounce emission clamp, escape
exclusion, bounce-0 AOVs, 0.05 origin push, cosine-weighted bounces).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtrace_tpu.config import RenderConfig
from pathtrace_tpu.render import unpack_channels

T_BIG = 1.0e6
TWO_PI = 6.283185307179586
# Rec.709 luma (pathtrace.cu:67-69)
LUMA_R, LUMA_G, LUMA_B = 0.2126, 0.7152, 0.0722


# The RNG primitives are shared with the jnp path (pathtrace_tpu/rng.py):
# pure int32 vector ops, Mosaic-compatible, so both backends draw from the
# SAME (seed, frame, sample, slot, pixel) uniform lattice.
from pathtrace_tpu.rng import P_GOLD as _P_GOLD
from pathtrace_tpu.rng import P_ROW as _P_ROW
from pathtrace_tpu.rng import P_FRAME as _P_FRAME
from pathtrace_tpu.rng import mix32 as _mix32
from pathtrace_tpu.rng import uniform_from_keys as _uniform_01


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def read_scene_scalars(scene_ref, num_spheres: int):
    """SMEM scene block -> tuple of per-sphere scalar tuples
    (rad, px, py, pz, er, eg, eb, cr, cg, cb). Read once per kernel; the
    values live in registers across the spp loop."""
    return tuple(
        tuple(scene_ref[i, j] for j in range(10)) for i in range(num_spheres)
    )


def read_cam_scalars(cam_ref):
    """SMEM camera block -> (eye xyz, 4x(basis xyz)) scalar tuples."""
    eye = (cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2])
    basis = tuple(
        (cam_ref[k, 0], cam_ref[k, 1], cam_ref[k, 2]) for k in range(1, 5)
    )
    return eye, basis


def trace_tile_sample(
    sc,  # scene scalars: tuple of N x (rad, px, py, pz, er, eg, eb, cr, cg, cb)
    eye,  # (ex, ey, ez)
    basis,  # 4 x (bx, by, bz): corner rays 00, 10, 01, 11
    rows,  # [TH, TW] f32 absolute pixel rows
    cols,  # [TH, TW] f32 absolute pixel cols
    draw,  # slot -> [TH, TW] uniforms (pure counter hash; AD-constant)
    *,
    num_spheres: int,
    max_bounces: int,
    jitter: bool,
    push: float,
    height: int,
    width: int,
    nee_light_index: int | None,
    brdf: str,
):
    """ONE sample's full trajectory for a tile — a PURE function of the
    scene/camera scalars, so ``jax.vjp`` of it inside a kernel yields the
    exact same detached-decision gradient estimator as the jnp backend
    (ops/trace.py) on the same lattice: discrete decisions (hit selection,
    normal flip, shadow visibility, RNG) enter only through ``jnp.where``
    conditions and are therefore AD-constants, while t, hit positions,
    normals, the NEE Lambert term and the bounce directions all carry
    derivatives. Shared by the forward megakernel and ops/pallas_ad.py.

    Returns (col_r, col_g, col_b, fn_x, fn_y, fn_z, fa_r, fa_g, fa_b, f_d,
    hit0, active) — per-tile arrays; AOV entries are zero off bounce-0 hits.
    """
    shape = rows.shape
    zeros = jnp.zeros(shape, jnp.float32)
    spb = 5 if brdf == "glossy" else 2
    eye_x, eye_y, eye_z = eye

    def bilerp_basis(axis, u, v):
        b00, b10, b01, b11 = (b[axis] for b in basis)
        bottom = b00 * (1.0 - u) + b10 * u
        top = b01 * (1.0 - u) + b11 * u
        return bottom * (1.0 - v) + top * v

    if jitter:
        r = rows + (draw(0) - 0.5)
        c = cols + (draw(1) - 0.5)
    else:
        r, c = rows, cols
    ndc_x = 2.0 * c * (1.0 / width) - 1.0
    ndc_y = 1.0 - 2.0 * r * (1.0 / height)
    u = (ndc_x + 1.0) * 0.5
    v = (ndc_y + 1.0) * 0.5
    dx = bilerp_basis(0, u, v)
    dy = bilerp_basis(1, u, v)
    dz = bilerp_basis(2, u, v)
    # broadcast_to, not jnp.full: the in-kernel-AD path (ops/pallas_ad.py)
    # passes TILE-shaped parameters, and jnp.full of an already-array fill
    # value lowers via device_put, which Mosaic cannot lower.
    ox = jnp.broadcast_to(eye_x, shape).astype(jnp.float32)
    oy = jnp.broadcast_to(eye_y, shape).astype(jnp.float32)
    oz = jnp.broadcast_to(eye_z, shape).astype(jnp.float32)

    col_r = zeros
    col_g = zeros
    col_b = zeros
    mask_r = jnp.ones(shape, jnp.float32)
    mask_g = jnp.ones(shape, jnp.float32)
    mask_b = jnp.ones(shape, jnp.float32)
    active = jnp.ones(shape, bool)

    fn_x = fn_y = fn_z = zeros  # first-bounce normal
    fa_r = fa_g = fa_b = zeros  # first-bounce albedo
    f_d = zeros  # first-bounce depth
    hit0 = jnp.zeros(shape, bool)

    for bounce in range(max_bounces):
        if bounce == 0:
            # Primary rays are unnormalized (reference depth convention).
            inv_len = jax.lax.rsqrt(_dot3(dx, dy, dz, dx, dy, dz))
            dnx, dny, dnz = dx * inv_len, dy * inv_len, dz * inv_len
        else:
            # Bounce directions are unit by construction (orthonormal
            # sampling frame): skip the rsqrt and the t rescale.
            inv_len = None
            dnx, dny, dnz = dx, dy, dz

        t_best = jnp.full(shape, T_BIG)
        hit = jnp.zeros(shape, bool)
        s_px = s_py = s_pz = zeros
        s_er = s_eg = s_eb = zeros
        s_cr = s_cg = s_cb = zeros
        for i in range(num_spheres):
            rad, px, py, pz, i_er, i_eg, i_eb, i_cr, i_cg, i_cb = sc[i]
            rel_x, rel_y, rel_z = px - ox, py - oy, pz - oz
            tca = _dot3(rel_x, rel_y, rel_z, dnx, dny, dnz)
            qx = rel_x - tca * dnx
            qy = rel_y - tca * dny
            qz = rel_z - tca * dnz
            d2 = _dot3(qx, qy, qz, qx, qy, qz)
            det = rad * rad - d2
            # Double-where keeps reverse-mode AD finite (ops/intersect.py:76):
            # sqrt'(0) = inf would otherwise multiply the (zero) cotangent of
            # missed spheres into NaN. Forward value identical to
            # sqrt(max(det, 0)).
            pos_det = det > 0.0
            thc = jnp.where(pos_det, jnp.sqrt(jnp.where(pos_det, det, 1.0)), 0.0)
            if inv_len is None:
                t_near = tca - thc
                t_far = tca + thc
            else:
                t_near = (tca - thc) * inv_len
                t_far = (tca + thc) * inv_len
            t = jnp.where(t_near > 0.0, t_near, t_far)
            valid = (det >= 0.0) & (t > 0.0) & (t < T_BIG)
            closer = valid & (t < t_best)
            t_best = jnp.where(closer, t, t_best)
            hit = hit | closer
            s_px = jnp.where(closer, px, s_px)
            s_py = jnp.where(closer, py, s_py)
            s_pz = jnp.where(closer, pz, s_pz)
            s_er = jnp.where(closer, i_er, s_er)
            s_eg = jnp.where(closer, i_eg, s_eg)
            s_eb = jnp.where(closer, i_eb, s_eb)
            s_cr = jnp.where(closer, i_cr, s_cr)
            s_cg = jnp.where(closer, i_cg, s_cg)
            s_cb = jnp.where(closer, i_cb, s_cb)

        hit_now = active & hit

        # hit position + normal (flipped toward the incoming ray)
        hx = ox + dx * t_best
        hy = oy + dy * t_best
        hz = oz + dz * t_best
        nx_, ny_, nz_ = hx - s_px, hy - s_py, hz - s_pz
        n_inv = jax.lax.rsqrt(_dot3(nx_, ny_, nz_, nx_, ny_, nz_) + 1e-20)
        nx_, ny_, nz_ = nx_ * n_inv, ny_ * n_inv, nz_ * n_inv
        flip = jnp.where(_dot3(nx_, ny_, nz_, dx, dy, dz) < 0.0, 1.0, -1.0)
        nx_, ny_, nz_ = nx_ * flip, ny_ * flip, nz_ * flip

        # emission accumulation (first-bounce clamp hack)
        er = mask_r * s_er
        eg = mask_g * s_eg
        eb = mask_b * s_eb
        if bounce == 0:
            er = jnp.clip(er, 0.0, 1.0)
            eg = jnp.clip(eg, 0.0, 1.0)
            eb = jnp.clip(eb, 0.0, 1.0)
        if nee_light_index is not None:
            # Next-event estimation (getDirectLighting semantics,
            # pathtrace.cu:109-148): deterministic shadow ray to the
            # light's bottom point, Lambert x emission x visibility,
            # modulated by the hit albedo and the reference's 0.5.
            li = nee_light_index
            l_rad, l_px, l_py, l_pz, l_er, l_eg, l_eb = sc[li][:7]
            lb_x = l_px
            lb_y = l_py - l_rad
            lb_z = l_pz
            # Light direction from the UNPUSHED hit position, shadow ray
            # from the pushed origin, range to the light from the pushed
            # origin — exactly getDirectLighting/testShadowRay
            # (pathtrace.cu:110,139-146) and ops/sampling.direct_lighting.
            sox = hx + nx_ * push
            soy = hy + ny_ * push
            soz = hz + nz_ * push
            lvx, lvy, lvz = lb_x - hx, lb_y - hy, lb_z - hz
            l_inv = jax.lax.rsqrt(
                _dot3(lvx, lvy, lvz, lvx, lvy, lvz) + 1e-20
            )
            ldx, ldy, ldz = lvx * l_inv, lvy * l_inv, lvz * l_inv
            svx, svy, svz = lb_x - sox, lb_y - soy, lb_z - soz
            t_light = jnp.sqrt(_dot3(svx, svy, svz, svx, svy, svz))
            diffuse = jnp.clip(
                _dot3(ldx, ldy, ldz, nx_, ny_, nz_), 0.0, 1.0
            )
            vis = jnp.ones(shape, bool)
            for i in range(num_spheres):
                if i == li:
                    continue
                rad, px, py, pz = sc[i][:4]
                rel_x, rel_y, rel_z = px - sox, py - soy, pz - soz
                tca = _dot3(rel_x, rel_y, rel_z, ldx, ldy, ldz)
                qx = rel_x - tca * ldx
                qy = rel_y - tca * ldy
                qz = rel_z - tca * ldz
                d2 = _dot3(qx, qy, qz, qx, qy, qz)
                det = rad * rad - d2
                pos_det = det > 0.0
                thc = jnp.where(
                    pos_det, jnp.sqrt(jnp.where(pos_det, det, 1.0)), 0.0
                )
                t_near = tca - thc
                t_far = tca + thc
                t = jnp.where(t_near > 0.0, t_near, t_far)
                blocked = (det >= 0.0) & (t > 0.0) & (t < t_light)
                vis = vis & ~blocked
            dl = diffuse * jnp.where(vis, 1.0, 0.0) * 0.5
            er = er + mask_r * dl * l_er * s_cr
            eg = eg + mask_g * dl * l_eg * s_cg
            eb = eb + mask_b * dl * l_eb * s_cb
        col_r = col_r + jnp.where(hit_now, er, 0.0)
        col_g = col_g + jnp.where(hit_now, eg, 0.0)
        col_b = col_b + jnp.where(hit_now, eb, 0.0)
        mask_r = jnp.where(hit_now, mask_r * s_cr, mask_r)
        mask_g = jnp.where(hit_now, mask_g * s_cg, mask_g)
        mask_b = jnp.where(hit_now, mask_b * s_cb, mask_b)

        if bounce == 0:
            fn_x = jnp.where(hit_now, nx_, fn_x)
            fn_y = jnp.where(hit_now, ny_, fn_y)
            fn_z = jnp.where(hit_now, nz_, fn_z)
            fa_r = jnp.where(hit_now, s_cr, fa_r)
            fa_g = jnp.where(hit_now, s_cg, fa_g)
            fa_b = jnp.where(hit_now, s_cb, fa_b)
            f_d = jnp.where(hit_now, t_best, f_d)
            hit0 = hit_now

        if bounce + 1 < max_bounces:
            # cosine-weighted bounce about the normal
            u1 = draw(2 + spb * bounce)
            u2 = draw(2 + spb * bounce + 1)
            # ortho basis ("combing coconuts", pathtrace.cu:121-124)
            use_a = jnp.abs(nx_) > jnp.abs(nz_)
            o1x = jnp.where(use_a, -ny_, 0.0)
            o1y = jnp.where(use_a, nx_, -nz_)
            o1z = jnp.where(use_a, 0.0, ny_)
            o1_inv = jax.lax.rsqrt(_dot3(o1x, o1y, o1z, o1x, o1y, o1z) + 1e-20)
            o1x, o1y, o1z = o1x * o1_inv, o1y * o1_inv, o1z * o1_inv
            # n x o1 of unit orthogonal vectors is unit; the sampled
            # direction from an orthonormal frame is unit — skip both
            # re-normalizations (pure rounding correction, ~1e-7).
            o2x = ny_ * o1z - nz_ * o1y
            o2y = nz_ * o1x - nx_ * o1z
            o2z = nx_ * o1y - ny_ * o1x
            phi = u1 * TWO_PI
            zc = jnp.sqrt(u2)  # power=1 cosine weighting
            sin_t = jnp.sqrt(jnp.maximum(1.0 - zc * zc, 0.0))
            cs, ss = jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t
            bdx = cs * o1x + ss * o2x + zc * nx_
            bdy = cs * o1y + ss * o2y + zc * ny_
            bdz = cs * o1z + ss * o2z + zc * nz_

            if brdf == "glossy":
                # The reference's "makeshift glossy BRDF" experiment
                # (pathtrace.cu:181-184): reflect the cosine-weighted
                # sample about the normal, perturb by 0.01*u3 - 0.005,
                # renormalize — exactly ops/sampling.glossy_direction
                # (same eps, same renormalizations for lattice parity
                # with the jnp backend).
                b_inv = jax.lax.rsqrt(
                    _dot3(bdx, bdy, bdz, bdx, bdy, bdz) + 1e-20
                )
                bdx, bdy, bdz = bdx * b_inv, bdy * b_inv, bdz * b_inv
                dn2 = 2.0 * _dot3(bdx, bdy, bdz, nx_, ny_, nz_)
                bdx = bdx - dn2 * nx_
                bdy = bdy - dn2 * ny_
                bdz = bdz - dn2 * nz_
                bdx = bdx + 0.01 * draw(2 + spb * bounce + 2) - 0.005
                bdy = bdy + 0.01 * draw(2 + spb * bounce + 3) - 0.005
                bdz = bdz + 0.01 * draw(2 + spb * bounce + 4) - 0.005
                g_inv = jax.lax.rsqrt(
                    _dot3(bdx, bdy, bdz, bdx, bdy, bdz) + 1e-20
                )
                bdx, bdy, bdz = bdx * g_inv, bdy * g_inv, bdz * g_inv

            n_ox = hx + nx_ * push
            n_oy = hy + ny_ * push
            n_oz = hz + nz_ * push
            ox = jnp.where(hit_now, n_ox, ox)
            oy = jnp.where(hit_now, n_oy, oy)
            oz = jnp.where(hit_now, n_oz, oz)
            dx = jnp.where(hit_now, bdx, dx)
            dy = jnp.where(hit_now, bdy, dy)
            dz = jnp.where(hit_now, bdz, dz)

        active = active & hit

    return (
        col_r, col_g, col_b,
        fn_x, fn_y, fn_z,
        fa_r, fa_g, fa_b,
        f_d,
        hit0, active,
    )


def _pathtrace_kernel(
    scene_ref,  # SMEM [N, 10]: radius, pos xyz, emission rgb, color rgb
    cam_ref,  # SMEM [5, 3]: eye pos; basis rays 00,10,01,11
    seed_ref,  # SMEM [5]: seed, frame, sample offset, row offset, col offset
    out_ref,  # VMEM [14, TH, TW]
    *,
    num_spheres: int,
    spp: int,
    max_bounces: int,
    jitter: bool,
    push: float,
    tile_h: int,
    tile_w: int,
    height: int,
    width: int,
    nee_light_index: int | None = None,
    emit_partials: bool = False,
    brdf: str = "diffuse",
    color_only: bool = False,
):
    ti = pl.program_id(0)
    tj = pl.program_id(1)

    shape = (tile_h, tile_w)
    # Per-pixel RNG key from ABSOLUTE pixel coordinates: streams do not
    # depend on the tile grid, so any tiling/sharding draws identically.
    # The row/col offsets (seed_ref[3:5]) position this kernel's local slab
    # inside the GLOBAL image — the shard_map hook (parallel/shard.py): a
    # device rendering rows [off, off + local_h) draws exactly its slice of
    # the global lattice, so sharded == single-chip bit-for-bit. This is the
    # scaled version of the reference's CUDA grid (Renderer.h:29-33).
    # (int32 iota only — Mosaic has no float iota; cast for the float path.)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + ti * tile_h + seed_ref[3]
    cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + tj * tile_w + seed_ref[4]
    rows = rows_i.astype(jnp.float32)
    cols = cols_i.astype(jnp.float32)
    pix_key = _mix32(rows_i * _P_GOLD ^ (cols_i * _P_ROW))
    base_key = _mix32(seed_ref[0] ^ _mix32(seed_ref[1] * _P_FRAME))
    # Slot lattice: 2 jitter + slots_per_bounce per bounce (2 cosine uniforms
    # for diffuse; +3 perturbation uniforms for the glossy experiment) —
    # identical to rng.sample_uniforms, so both backends draw the SAME lattice.
    spb = 5 if brdf == "glossy" else 2
    n_slots = jnp.int32(2 + spb * max_bounces)
    sample_offset = seed_ref[2]

    sc = read_scene_scalars(scene_ref, num_spheres)
    eye, cam_basis = read_cam_scalars(cam_ref)

    zeros = jnp.zeros(shape, jnp.float32)

    trace_kwargs = dict(
        num_spheres=num_spheres,
        max_bounces=max_bounces,
        jitter=jitter,
        push=push,
        height=height,
        width=width,
        nee_light_index=nee_light_index,
        brdf=brdf,
    )

    if color_only:
        # RAW color sums only (3 channels) — the fwd leg of the fused
        # loss+grad paths, which never read the AOV/variance channels;
        # skipping the Welford updates saves ~35% of the VPU work.
        def color_body(s, carry):
            s_u = sample_offset + s

            def draw(slot):
                dk = _mix32(
                    base_key ^ ((s_u * n_slots + jnp.int32(slot)) * _P_GOLD)
                )
                return _uniform_01(pix_key, dk)

            out = trace_tile_sample(
                sc, eye, cam_basis, rows, cols, draw, **trace_kwargs
            )
            return (carry[0] + out[0], carry[1] + out[1], carry[2] + out[2])

        sums = jax.lax.fori_loop(
            0, spp, color_body, (zeros, zeros, zeros), unroll=False
        )
        for k in range(3):
            out_ref[k] = sums[k]
        return

    def sample_body(s, carry):
        s_u = sample_offset + s

        def draw(slot):
            dk = _mix32(base_key ^ ((s_u * n_slots + jnp.int32(slot)) * _P_GOLD))
            return _uniform_01(pix_key, dk)

        (
            sum_cr, sum_cg, sum_cb,
            sum_nx, sum_ny, sum_nz,
            sum_ar, sum_ag, sum_ab,
            sum_d,
            n_c, mean_c, m2_c,
            n_n, mean_n, m2_n,
            n_a, mean_a, m2_a,
            n_d, mean_d, m2_d,
        ) = carry

        (
            col_r, col_g, col_b,
            fn_x, fn_y, fn_z,
            fa_r, fa_g, fa_b,
            f_d,
            hit0, active,
        ) = trace_tile_sample(
            sc, eye, cam_basis, rows, cols, draw, **trace_kwargs,
        )

        # -- accumulate sample ---------------------------------------------
        sum_cr = sum_cr + col_r
        sum_cg = sum_cg + col_g
        sum_cb = sum_cb + col_b
        sum_nx = sum_nx + fn_x
        sum_ny = sum_ny + fn_y
        sum_nz = sum_nz + fn_z
        sum_ar = sum_ar + fa_r
        sum_ag = sum_ag + fa_g
        sum_ab = sum_ab + fa_b
        sum_d = sum_d + f_d

        def welford(n, mean, m2, x, include):
            inc = include.astype(jnp.float32)
            n_new = n + inc
            delta = x - mean
            mean_new = mean + jnp.where(n_new > 0.0, inc * delta / jnp.maximum(n_new, 1.0), 0.0)
            delta2 = x - mean_new
            m2_new = m2 + inc * delta * delta2
            return n_new, mean_new, m2_new

        lum_c = LUMA_R * col_r + LUMA_G * col_g + LUMA_B * col_b
        lum_n = LUMA_R * fn_x + LUMA_G * fn_y + LUMA_B * fn_z
        lum_a = LUMA_R * fa_r + LUMA_G * fa_g + LUMA_B * fa_b
        n_c, mean_c, m2_c = welford(n_c, mean_c, m2_c, lum_c, active)
        n_n, mean_n, m2_n = welford(n_n, mean_n, m2_n, lum_n, hit0)
        n_a, mean_a, m2_a = welford(n_a, mean_a, m2_a, lum_a, hit0)
        n_d, mean_d, m2_d = welford(n_d, mean_d, m2_d, f_d, hit0)

        return (
            sum_cr, sum_cg, sum_cb,
            sum_nx, sum_ny, sum_nz,
            sum_ar, sum_ag, sum_ab,
            sum_d,
            n_c, mean_c, m2_c,
            n_n, mean_n, m2_n,
            n_a, mean_a, m2_a,
            n_d, mean_d, m2_d,
        )

    init = (zeros,) * 10 + (zeros,) * 12
    carry = jax.lax.fori_loop(0, spp, sample_body, init, unroll=False)
    (
        sum_cr, sum_cg, sum_cb,
        sum_nx, sum_ny, sum_nz,
        sum_ar, sum_ag, sum_ab,
        sum_d,
        n_c, mean_c, m2_c,
        n_n, mean_n, m2_n,
        n_a, mean_a, m2_a,
        n_d, mean_d, m2_d,
    ) = carry

    if emit_partials:
        # Shard/chunk-mergeable partials instead of finalized channels:
        # 10 raw sums + (n, mean, M2) per variance feature — exactly the
        # ops/variance.Moments monoid, so Chan merges across spp batches
        # (progressive.py) or mesh shards reproduce the monolithic render.
        for k, v in enumerate(
            (sum_cr, sum_cg, sum_cb, sum_nx, sum_ny, sum_nz,
             sum_ar, sum_ag, sum_ab, sum_d,
             n_c, mean_c, m2_c, n_n, mean_n, m2_n,
             n_a, mean_a, m2_a, n_d, mean_d, m2_d)
        ):
            out_ref[k] = v
        return

    inv_spp = 1.0 / spp

    def var(n, m2):
        return jnp.where(n >= 2.0, m2 / jnp.maximum(n - 1.0, 1.0), 0.0)

    out_ref[0] = sum_cr * inv_spp
    out_ref[1] = sum_cg * inv_spp
    out_ref[2] = sum_cb * inv_spp
    out_ref[3] = sum_nx * inv_spp
    out_ref[4] = sum_ny * inv_spp
    out_ref[5] = sum_nz * inv_spp
    out_ref[6] = sum_ar * inv_spp
    out_ref[7] = sum_ag * inv_spp
    out_ref[8] = sum_ab * inv_spp
    out_ref[9] = sum_d * inv_spp
    out_ref[10] = var(n_c, m2_c)
    out_ref[11] = var(n_n, m2_n)
    out_ref[12] = var(n_a, m2_a)
    out_ref[13] = var(n_d, m2_d)


def interpret_param(interpret):
    """Resolve the ``interpret`` knob used across the Pallas launch paths:
    False = compile (Mosaic); True = the Mosaic TPU interpreter (exact
    TPU semantics on CPU — the CI default); "jax" = the generic Pallas
    interpreter. The generic mode exists because the Mosaic interpreter
    deadlocks under a MULTI-PROCESS runtime (its device-emulation
    semaphores wait forever on a mesh that spans OS processes, observed
    with the 2-process gloo pod); its output is bit-identical for these
    kernels (tests/multihost_worker.py relies on this)."""
    if not interpret:
        return False
    if interpret == "jax":
        return True
    return pltpu.InterpretParams()


def _pack_scene(scene) -> jnp.ndarray:
    return jnp.concatenate(
        [scene.radius[:, None], scene.position, scene.emission, scene.color],
        axis=1,
    ).astype(jnp.float32)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def make_seed_array(cfg: RenderConfig, frame, sample_offset=0, row_offset=0, col_offset=0):
    """The kernel's SMEM scalar block: (seed, frame, sample/row/col offsets).
    frame and the offsets may be traced (e.g. ``axis_index`` under shard_map)."""
    return jnp.stack(
        [
            jnp.asarray(cfg.seed & 0x7FFFFFFF, jnp.int32),
            jnp.asarray(frame, jnp.int32),
            jnp.asarray(sample_offset, jnp.int32),
            jnp.asarray(row_offset, jnp.int32),
            jnp.asarray(col_offset, jnp.int32),
        ]
    )


def tile_dims(cfg: RenderConfig, local_h: int | None = None, local_w: int | None = None):
    """(tile_h, tile_w, pad_h, pad_w) for a (possibly partial) image slab."""
    h = cfg.height if local_h is None else local_h
    w = cfg.width if local_w is None else local_w
    tile_h, tile_w = cfg.tile_shape
    tile_h = max(8, min(tile_h, _round_up(h, 8)))
    tile_w = max(128, _round_up(min(tile_w, w), 128))
    return tile_h, tile_w, _round_up(h, tile_h), _round_up(w, tile_w)


def _launch_pathtrace(
    scene,
    cam,
    cfg: RenderConfig,
    seed_arr,
    *,
    spp: int,
    local_h: int,
    emit_partials: bool,
    interpret: bool,
    color_only: bool = False,
):
    """Shared pallas_call plumbing for the megakernel (full frame or slab)."""
    tile_h, tile_w, pad_h, pad_w = tile_dims(cfg, local_h)
    scene_params = _pack_scene(scene)
    basis = cam.eye_ray_basis(cfg.width, cfg.height)
    cam_params = jnp.concatenate([cam.position[None, :], basis], axis=0)

    n_ch = 3 if color_only else (22 if emit_partials else 14)
    grid = (pad_h // tile_h, pad_w // tile_w)
    kernel = functools.partial(
        _pathtrace_kernel,
        num_spheres=scene.num_objects,
        spp=spp,
        max_bounces=cfg.max_bounces,
        jitter=cfg.resolved_jitter,
        push=cfg.push_ray_origin,
        tile_h=tile_h,
        tile_w=tile_w,
        height=cfg.height,
        width=cfg.width,
        nee_light_index=cfg.light_index if cfg.nee else None,
        emit_partials=emit_partials,
        brdf=cfg.brdf,
        color_only=color_only,
    )
    # Counted, not estimated: the roofline counter traces the kernel's own
    # per-sample op sequence (utils/roofline.py; lru-cached per config).
    # ~494 f32 flops + 60 int + 14 transcendental per segment for the
    # diffuse Cornell config; NEE raises it to ~782 flops.
    from pathtrace_tpu.utils.roofline import megakernel_ops

    seg_ops = megakernel_ops(cfg, scene.num_objects)["per_segment"]
    n_segments = pad_h * pad_w * spp * cfg.max_bounces
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_ch, tile_h, tile_w),
            lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_ch, pad_h, pad_w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(seg_ops["flops"] * n_segments),
            bytes_accessed=n_ch * pad_h * pad_w * 4,
            transcendentals=int(seg_ops["transcendentals"] * n_segments),
        ),
        interpret=interpret_param(interpret),
    )(scene_params, cam_params, seed_arr)
    return out[:, :local_h, : cfg.width]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "interpret"),
)
def render_channels_pallas(scene, cam, cfg: RenderConfig, frame=0, interpret=False):
    """Render via the Pallas megakernel -> packed [H, W, 14] buffer."""
    seed_arr = make_seed_array(cfg, frame)
    out = _launch_pathtrace(
        scene, cam, cfg, seed_arr,
        spp=cfg.spp, local_h=cfg.height, emit_partials=False, interpret=interpret,
    )
    return jnp.moveaxis(out, 0, -1)  # [H, W, 14]


def render_aovs_pallas(scene, cam, cfg: RenderConfig, frame=0, interpret=False) -> Dict:
    return unpack_channels(render_channels_pallas(scene, cam, cfg, frame, interpret))


def render_color_sums_pallas(
    scene,
    cam,
    cfg: RenderConfig,
    frame,
    row_offset=0,
    local_h: int | None = None,
    spp: int | None = None,
    sample_offset=0,
    interpret: bool = False,
):
    """RAW color sums [local_h, W, 3] over the slab's sample range — the
    color-only megakernel mode (no AOV/Welford work). Divide by the GLOBAL
    spp after any cross-shard psum. Not jitted — compose inside jit/shard_map."""
    local_h = cfg.height if local_h is None else local_h
    spp = cfg.spp if spp is None else spp
    seed_arr = make_seed_array(cfg, frame, sample_offset, row_offset)
    out = _launch_pathtrace(
        scene, cam, cfg, seed_arr,
        spp=spp, local_h=local_h, emit_partials=False, interpret=interpret,
        color_only=True,
    )
    return jnp.moveaxis(out, 0, -1)


def _partials_from_block(out):
    from pathtrace_tpu.ops.variance import Moments

    sums = {
        "color": jnp.moveaxis(out[0:3], 0, -1),
        "normal": jnp.moveaxis(out[3:6], 0, -1),
        "albedo": jnp.moveaxis(out[6:9], 0, -1),
        "depth": out[9],
    }
    moments = {
        "color": Moments(out[10], out[11], out[12]),
        "normal": Moments(out[13], out[14], out[15]),
        "albedo": Moments(out[16], out[17], out[18]),
        "depth": Moments(out[19], out[20], out[21]),
    }
    return sums, moments


def accumulate_frame_pallas(
    scene,
    cam,
    cfg: RenderConfig,
    frame,
    row_offset=0,
    local_h: int | None = None,
    spp: int | None = None,
    sample_offset=0,
    interpret: bool = False,
):
    """Megakernel slab pass -> shard/chunk-mergeable (sums, moments)
    partials — the Pallas drop-in for ``render.accumulate_frame`` with the
    IDENTICAL contract, so parallel/shard.py can run the fast kernel under
    shard_map: rows [row_offset, row_offset + local_h) of the global frame,
    samples [sample_offset, sample_offset + spp) of the global lattice.
    ``row_offset``/``sample_offset`` may be traced (mesh ``axis_index``).
    Not jitted — call from inside a jitted/shard_mapped region."""
    local_h = cfg.height if local_h is None else local_h
    spp = cfg.spp if spp is None else spp
    seed_arr = make_seed_array(cfg, frame, sample_offset, row_offset)
    out = _launch_pathtrace(
        scene, cam, cfg, seed_arr,
        spp=spp, local_h=local_h, emit_partials=True, interpret=interpret,
    )
    return _partials_from_block(out)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def render_partials_pallas(
    scene, cam, cfg: RenderConfig, frame=0, sample_offset=0, interpret=False
):
    """Megakernel pass -> shard/chunk-mergeable (sums, moments) partials,
    the same contract as ``render.accumulate_frame``: sums are RAW channel
    sums over ``cfg.spp`` samples at global sample offsets
    [sample_offset, sample_offset + spp); moments are per-feature Welford
    ``Moments(n, mean, m2)``. Feeding progressive accumulation
    (progressive.py) and spp sharding at full kernel speed."""
    return accumulate_frame_pallas(
        scene, cam, cfg, frame, sample_offset=sample_offset, interpret=interpret
    )
