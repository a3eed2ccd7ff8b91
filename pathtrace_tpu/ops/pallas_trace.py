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


def _pathtrace_kernel(
    scene_ref,  # SMEM [N, 10]: radius, pos xyz, emission rgb, color rgb
    cam_ref,  # SMEM [5, 3]: eye pos; basis rays 00,10,01,11
    seed_ref,  # SMEM [3]: seed, frame, global sample offset
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
):
    ti = pl.program_id(0)
    tj = pl.program_id(1)

    shape = (tile_h, tile_w)
    # Per-pixel RNG key from ABSOLUTE pixel coordinates: streams do not
    # depend on the tile grid, so any tiling/sharding draws identically.
    # (int32 iota only — Mosaic has no float iota; cast for the float path.)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + ti * tile_h
    cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + tj * tile_w
    rows = rows_i.astype(jnp.float32)
    cols = cols_i.astype(jnp.float32)
    pix_key = _mix32(rows_i * _P_GOLD ^ (cols_i * _P_ROW))
    base_key = _mix32(seed_ref[0] ^ _mix32(seed_ref[1] * _P_FRAME))
    n_slots = jnp.int32(2 + 2 * max_bounces)
    sample_offset = seed_ref[2]

    eye_x, eye_y, eye_z = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]

    def bilerp_basis(axis, u, v):
        """Bilinear interp of basis component ``axis`` at (u, v) in [0,1]."""
        b00, b10 = cam_ref[1, axis], cam_ref[2, axis]
        b01, b11 = cam_ref[3, axis], cam_ref[4, axis]
        bottom = b00 * (1.0 - u) + b10 * u
        top = b01 * (1.0 - u) + b11 * u
        return bottom * (1.0 - v) + top * v

    zeros = jnp.zeros(shape, jnp.float32)

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

        # -- primary ray ---------------------------------------------------
        if jitter:
            r = rows + (draw(0) - 0.5)
            c = cols + (draw(1) - 0.5)
        else:
            r = rows
            c = cols
        ndc_x = 2.0 * c * (1.0 / width) - 1.0
        ndc_y = 1.0 - 2.0 * r * (1.0 / height)
        u = (ndc_x + 1.0) * 0.5
        v = (ndc_y + 1.0) * 0.5
        dx = bilerp_basis(0, u, v)
        dy = bilerp_basis(1, u, v)
        dz = bilerp_basis(2, u, v)
        ox = jnp.full(shape, eye_x)
        oy = jnp.full(shape, eye_y)
        oz = jnp.full(shape, eye_z)

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
            s_rad = zeros
            for i in range(num_spheres):
                rad = scene_ref[i, 0]
                px, py, pz = scene_ref[i, 1], scene_ref[i, 2], scene_ref[i, 3]
                rel_x, rel_y, rel_z = px - ox, py - oy, pz - oz
                tca = _dot3(rel_x, rel_y, rel_z, dnx, dny, dnz)
                qx = rel_x - tca * dnx
                qy = rel_y - tca * dny
                qz = rel_z - tca * dnz
                d2 = _dot3(qx, qy, qz, qx, qy, qz)
                det = rad * rad - d2
                thc = jnp.sqrt(jnp.maximum(det, 0.0))
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
                s_er = jnp.where(closer, scene_ref[i, 4], s_er)
                s_eg = jnp.where(closer, scene_ref[i, 5], s_eg)
                s_eb = jnp.where(closer, scene_ref[i, 6], s_eb)
                s_cr = jnp.where(closer, scene_ref[i, 7], s_cr)
                s_cg = jnp.where(closer, scene_ref[i, 8], s_cg)
                s_cb = jnp.where(closer, scene_ref[i, 9], s_cb)
                s_rad = jnp.where(closer, rad, s_rad)

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
                lb_x = scene_ref[li, 1]
                lb_y = scene_ref[li, 2] - scene_ref[li, 0]
                lb_z = scene_ref[li, 3]
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
                    rad = scene_ref[i, 0]
                    px, py, pz = scene_ref[i, 1], scene_ref[i, 2], scene_ref[i, 3]
                    rel_x, rel_y, rel_z = px - sox, py - soy, pz - soz
                    tca = _dot3(rel_x, rel_y, rel_z, ldx, ldy, ldz)
                    qx = rel_x - tca * ldx
                    qy = rel_y - tca * ldy
                    qz = rel_z - tca * ldz
                    d2 = _dot3(qx, qy, qz, qx, qy, qz)
                    det = rad * rad - d2
                    thc = jnp.sqrt(jnp.maximum(det, 0.0))
                    t_near = tca - thc
                    t_far = tca + thc
                    t = jnp.where(t_near > 0.0, t_near, t_far)
                    blocked = (det >= 0.0) & (t > 0.0) & (t < t_light)
                    vis = vis & ~blocked
                dl = diffuse * jnp.where(vis, 1.0, 0.0) * 0.5
                er = er + mask_r * dl * scene_ref[li, 4] * s_cr
                eg = eg + mask_g * dl * scene_ref[li, 5] * s_cg
                eb = eb + mask_b * dl * scene_ref[li, 6] * s_cb
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
                u1 = draw(2 + 2 * bounce)
                u2 = draw(3 + 2 * bounce)
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


def _pack_scene(scene) -> jnp.ndarray:
    return jnp.concatenate(
        [scene.radius[:, None], scene.position, scene.emission, scene.color],
        axis=1,
    ).astype(jnp.float32)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "interpret"),
)
def render_channels_pallas(scene, cam, cfg: RenderConfig, frame=0, interpret=False):
    """Render via the Pallas megakernel -> packed [H, W, 14] buffer."""
    if cfg.brdf != "diffuse":
        raise NotImplementedError(
            "the Pallas megakernel implements the diffuse (and NEE) paths; "
            "glossy draws a wider RNG lattice and runs on the jnp backend"
        )
    tile_h, tile_w = cfg.tile_shape
    tile_h = max(8, tile_h)
    tile_w = max(128, _round_up(min(tile_w, cfg.width), 128))
    pad_h = _round_up(cfg.height, tile_h)
    pad_w = _round_up(cfg.width, tile_w)

    scene_params = _pack_scene(scene)
    basis = cam.eye_ray_basis(cfg.width, cfg.height)
    cam_params = jnp.concatenate([cam.position[None, :], basis], axis=0)
    seed_arr = jnp.stack(
        [
            jnp.asarray(cfg.seed & 0x7FFFFFFF, jnp.int32),
            jnp.asarray(frame, jnp.int32),
            jnp.asarray(0, jnp.int32),  # global sample offset (spp sharding)
        ]
    )

    grid = (pad_h // tile_h, pad_w // tile_w)
    kernel = functools.partial(
        _pathtrace_kernel,
        num_spheres=scene.num_objects,
        spp=cfg.spp,
        max_bounces=cfg.max_bounces,
        jitter=cfg.resolved_jitter,
        push=cfg.push_ray_origin,
        tile_h=tile_h,
        tile_w=tile_w,
        height=cfg.height,
        width=cfg.width,
        nee_light_index=cfg.light_index if cfg.nee else None,
    )
    flops_per_segment = 350  # ~intersection(9 spheres) + shading + sampling
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (14, tile_h, tile_w),
            lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((14, pad_h, pad_w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_segment * pad_h * pad_w * cfg.spp * cfg.max_bounces,
            bytes_accessed=14 * pad_h * pad_w * 4,
            transcendentals=3 * pad_h * pad_w * cfg.spp * cfg.max_bounces,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(scene_params, cam_params, seed_arr)
    out = out[:, : cfg.height, : cfg.width]
    return jnp.moveaxis(out, 0, -1)  # [H, W, 14]


def render_aovs_pallas(scene, cam, cfg: RenderConfig, frame=0, interpret=False) -> Dict:
    return unpack_channels(render_channels_pallas(scene, cam, cfg, frame, interpret))


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
    from pathtrace_tpu.ops.variance import Moments

    if cfg.brdf != "diffuse":
        raise NotImplementedError(
            "the Pallas megakernel implements the diffuse (and NEE) paths; "
            "glossy draws a wider RNG lattice and runs on the jnp backend"
        )
    tile_h, tile_w = cfg.tile_shape
    tile_h = max(8, tile_h)
    tile_w = max(128, _round_up(min(tile_w, cfg.width), 128))
    pad_h = _round_up(cfg.height, tile_h)
    pad_w = _round_up(cfg.width, tile_w)

    scene_params = _pack_scene(scene)
    basis = cam.eye_ray_basis(cfg.width, cfg.height)
    cam_params = jnp.concatenate([cam.position[None, :], basis], axis=0)
    seed_arr = jnp.stack(
        [
            jnp.asarray(cfg.seed & 0x7FFFFFFF, jnp.int32),
            jnp.asarray(frame, jnp.int32),
            jnp.asarray(sample_offset, jnp.int32),
        ]
    )

    grid = (pad_h // tile_h, pad_w // tile_w)
    kernel = functools.partial(
        _pathtrace_kernel,
        num_spheres=scene.num_objects,
        spp=cfg.spp,
        max_bounces=cfg.max_bounces,
        jitter=cfg.resolved_jitter,
        push=cfg.push_ray_origin,
        tile_h=tile_h,
        tile_w=tile_w,
        height=cfg.height,
        width=cfg.width,
        nee_light_index=cfg.light_index if cfg.nee else None,
        emit_partials=True,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (22, tile_h, tile_w),
            lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((22, pad_h, pad_w), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(scene_params, cam_params, seed_arr)
    out = out[:, : cfg.height, : cfg.width]
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
