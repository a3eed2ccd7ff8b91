"""Hand-derived Pallas backward for the NEE estimator: ALL parameters
(emission/albedo/geometry/camera) in ~half the op budget of in-kernel AD.

Under NEE (the reference's ``getDirectLighting``, ``pathtrace.cu:109-148``)
a sample's radiance is

    C_ch = sum_n hit_n * [ clamp_0?(mask_n*e_n) + mask_n*dl_n*le_ch*c_n ]
    dl_n = 0.5 * vis_n * clamp(dot(ld_n, n_n), 0, 1)

Two structural facts make a hand sweep much cheaper than replaying the
trajectory through ``jax.vjp`` (ops/pallas_ad.py, 1988.6 counted
flops/segment + a separate 877.8-flop color pass for the loss cotangent):

1. **The argmin is dead weight in the backward.** ~60% of the forward's
   op budget is the 9-sphere closest-hit search and the 8-sphere shadow
   visibility test — and both are DETACHED decisions under this estimator
   (``grad.py`` docs). Only the winner's t-chain, the normal, the NEE
   Lambert term and the cosine-frame sampling chain carry derivatives,
   and each is closed-form: the hand reverse sweep costs ~a third of a
   forward, not ~1.3 forwards.

2. **Geometry cotangents have rank 3.** The ONLY continuous geometry
   dependence of the radiance is through the per-bounce Lambert scalars
   dl_n, whose cotangents are linear in the 3 per-pixel loss cotangents
   g_ch. So the sweep can run ONCE per sample with channel-SYMBOLIC
   cotangents (each geometric cotangent is a 3-vector of coefficients of
   g) and the unknown MSE cotangent — which needs the full-frame spp mean
   — is contracted per pixel AFTER the spp loop. That deletes the
   separate color pass entirely: fwd+bwd in ONE trajectory pass, the same
   fusion the diffuse product-chain kernel achieves
   (ops/pallas_grad.py:_fused_loss_grad_kernel), now for the general
   estimator.

Modes:

- ``fused``: the symbolic single-pass MSE fwd+bwd described above — the
  fast path for ``pallas_loss_and_grads`` on NEE configs.
- ``replay``: the same hand sweep against a KNOWN per-pixel color
  cotangent (scalar cotangents — ~1/3 the sweep cost of symbolic). This
  is the SPMD building block: under tile+spp sharding no device can know
  the loss cotangent before a psum, so the sharded step is color pass ->
  psum -> replay (parallel/shard.py), and replay replaces the vjp kernel
  at ~60% of its cost.

Decision conventions match ops/pallas_trace.trace_tile_sample exactly
(clamp subgradient 0.5 at the boundary, det>0 gate on the sqrt chain,
normal flip / shadow visibility / hit selection detached), so gradients
are the SAME detached-decision estimator as jnp ``jax.grad`` and the
in-kernel-AD kernel — asserted by tests/test_pallas_nee_grad.py and the
f64 frozen-replay grad gate (scripts/grad_gate.py).

Glossy configs stay on the generic AD kernel (the perturbed-reflection
chain is not hand-derived here); ``pallas_loss_and_grads`` dispatches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtrace_tpu.config import RenderConfig
from pathtrace_tpu.ops.pallas_trace import (
    T_BIG,
    TWO_PI,
    _dot3,
    _mix32,
    _pack_scene,
    _round_up,
    _uniform_01,
    _P_FRAME,
    _P_GOLD,
    _P_ROW,
    interpret_param,
    make_seed_array,
    tile_dims,
)

GRAD_ROWS = 16  # >= num_spheres + 5 (eye + 4 basis rows)
GRAD_COLS = 128
# Sphere rows use the pallas_ad block layout: 0 radius, 1-3 position,
# 4-6 emission, 7-9 color; loss partial rides at [num_spheres, 10].
LOSS_COL = 10


def _clip_grad(v):
    """jnp.clip subgradient: 1 inside (0,1), 0 outside, 0.5 AT the
    boundaries (lax.max/min tie-split) — must match the vjp bitwise
    (pallas_grad.py:204-210)."""
    inside = ((v >= 0.0) & (v <= 1.0)).astype(jnp.float32)
    on_edge = ((v == 0.0) | (v == 1.0)).astype(jnp.float32)
    return inside - 0.5 * on_edge


def _nee_grad_kernel(
    scene_ref,  # SMEM [N, 10]
    cam_ref,  # SMEM [5, 3]
    seed_ref,  # SMEM [5]: seed, frame, sample/row/col offsets
    *refs,  # fused: (target, grad, color); replay: (ct, grad)
    mode: str,
    num_spheres: int,
    spp: int,
    max_bounces: int,
    jitter: bool,
    push: float,
    tile_h: int,
    tile_w: int,
    height: int,
    width: int,
    light_index: int,
):
    if mode == "fused":
        target_ref, grad_ref, color_ref = refs
    else:
        ct_ref, grad_ref = refs
    ti = pl.program_id(0)
    tj = pl.program_id(1)

    shape = (tile_h, tile_w)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + ti * tile_h + seed_ref[3]
    cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + tj * tile_w + seed_ref[4]
    rows = rows_i.astype(jnp.float32)
    cols = cols_i.astype(jnp.float32)
    pix_key = _mix32(rows_i * _P_GOLD ^ (cols_i * _P_ROW))
    base_key = _mix32(seed_ref[0] ^ _mix32(seed_ref[1] * _P_FRAME))
    n_slots = jnp.int32(2 + 2 * max_bounces)
    sample_offset = seed_ref[2]

    eye_x, eye_y, eye_z = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]

    zeros = jnp.zeros(shape, jnp.float32)
    in_image = (rows_i < height) & (cols_i < width)
    li = light_index
    l_rad = scene_ref[li, 0]
    l_px, l_py, l_pz = scene_ref[li, 1], scene_ref[li, 2], scene_ref[li, 3]
    le = (scene_ref[li, 4], scene_ref[li, 5], scene_ref[li, 6])
    lb = (l_px, l_py - l_rad, l_pz)

    # Channel components carried by the sweep's cotangents: the symbolic
    # coefficients of (g_r, g_g, g_b) in fused mode; the single contracted
    # value in replay mode (where g is a known input).
    C = 3 if mode == "fused" else 1
    if mode == "replay":
        g_known = tuple(jnp.where(in_image, ct_ref[ch], 0.0) for ch in range(3))

    # Carry layout (all [TH, TW] f32):
    #   shading: per sphere (A_e rgb, A_c rgb) — channel-aligned, 6N
    #   geometry sums+Kahan comps: per sphere (r, px, py, pz) x C -> 4*N*C
    #            camera (eye xyz + basis 4x3) x C -> 15*C, each twice
    #   fused only: color sums rgb
    n_geom = (4 * num_spheres + 15) * C
    n_shade = 6 * num_spheres
    n_carry = n_shade + 2 * n_geom + (3 if mode == "fused" else 0)

    def sample_body(s, carry):
        s_u = sample_offset + s

        def draw(slot):
            dk = _mix32(base_key ^ ((s_u * n_slots + jnp.int32(slot)) * _P_GOLD))
            return _uniform_01(pix_key, dk)

        acc = list(carry)

        # ---- forward trajectory (mirrors _pathtrace_kernel, NEE on) ----
        if jitter:
            r = rows + (draw(0) - 0.5)
            c = cols + (draw(1) - 0.5)
        else:
            r, c = rows, cols
        ndc_x = 2.0 * c * (1.0 / width) - 1.0
        ndc_y = 1.0 - 2.0 * r * (1.0 / height)
        u = (ndc_x + 1.0) * 0.5
        v = (ndc_y + 1.0) * 0.5
        w00 = (1.0 - u) * (1.0 - v)
        w10 = u * (1.0 - v)
        w01 = (1.0 - u) * v
        w11 = u * v

        def bilerp(axis):
            return (
                w00 * cam_ref[1, axis] + w10 * cam_ref[2, axis]
                + w01 * cam_ref[3, axis] + w11 * cam_ref[4, axis]
            )

        dx, dy, dz = bilerp(0), bilerp(1), bilerp(2)
        ox = jnp.full(shape, eye_x)
        oy = jnp.full(shape, eye_y)
        oz = jnp.full(shape, eye_z)

        col = [zeros, zeros, zeros]
        mask = [jnp.ones(shape, jnp.float32) for _ in range(3)]
        active = jnp.ones(shape, bool)
        tape = []

        for bounce in range(max_bounces):
            if bounce == 0:
                inv_len = jax.lax.rsqrt(_dot3(dx, dy, dz, dx, dy, dz))
                dnx, dny, dnz = dx * inv_len, dy * inv_len, dz * inv_len
            else:
                inv_len = None
                dnx, dny, dnz = dx, dy, dz

            t_best = jnp.full(shape, T_BIG)
            hit = jnp.zeros(shape, bool)
            s_idx = jnp.zeros(shape, jnp.int32)
            s_rad = zeros
            s_px = s_py = s_pz = zeros
            s_er = s_eg = s_eb = zeros
            s_cr = s_cg = s_cb = zeros
            s_sig = zeros  # winner's near/far sign: t = tca + sig*thc
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
                near = t_near > 0.0
                t = jnp.where(near, t_near, t_far)
                valid = (det >= 0.0) & (t > 0.0) & (t < T_BIG)
                closer = valid & (t < t_best)
                t_best = jnp.where(closer, t, t_best)
                hit = hit | closer
                s_idx = jnp.where(closer, i, s_idx)
                s_rad = jnp.where(closer, rad, s_rad)
                s_px = jnp.where(closer, px, s_px)
                s_py = jnp.where(closer, py, s_py)
                s_pz = jnp.where(closer, pz, s_pz)
                s_er = jnp.where(closer, scene_ref[i, 4], s_er)
                s_eg = jnp.where(closer, scene_ref[i, 5], s_eg)
                s_eb = jnp.where(closer, scene_ref[i, 6], s_eb)
                s_cr = jnp.where(closer, scene_ref[i, 7], s_cr)
                s_cg = jnp.where(closer, scene_ref[i, 8], s_cg)
                s_cb = jnp.where(closer, scene_ref[i, 9], s_cb)
                s_sig = jnp.where(closer, jnp.where(near, -1.0, 1.0), s_sig)

            hit_now = active & hit

            hx = ox + dx * t_best
            hy = oy + dy * t_best
            hz = oz + dz * t_best
            npx, npy, npz = hx - s_px, hy - s_py, hz - s_pz
            n_inv = jax.lax.rsqrt(_dot3(npx, npy, npz, npx, npy, npz) + 1e-20)
            nux, nuy, nuz = npx * n_inv, npy * n_inv, npz * n_inv
            flip = jnp.where(_dot3(nux, nuy, nuz, dx, dy, dz) < 0.0, 1.0, -1.0)
            nx_, ny_, nz_ = nux * flip, nuy * flip, nuz * flip

            # NEE (getDirectLighting semantics, pathtrace.cu:109-148)
            sox = hx + nx_ * push
            soy = hy + ny_ * push
            soz = hz + nz_ * push
            lvx, lvy, lvz = lb[0] - hx, lb[1] - hy, lb[2] - hz
            l_inv = jax.lax.rsqrt(_dot3(lvx, lvy, lvz, lvx, lvy, lvz) + 1e-20)
            ldx, ldy, ldz = lvx * l_inv, lvy * l_inv, lvz * l_inv
            svx, svy, svz = lb[0] - sox, lb[1] - soy, lb[2] - soz
            t_light = jnp.sqrt(_dot3(svx, svy, svz, svx, svy, svz))
            dr = _dot3(ldx, ldy, ldz, nx_, ny_, nz_)
            diffuse = jnp.clip(dr, 0.0, 1.0)
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
            # dlw: the detached factor of d(dl)/d(dr) — vis * 0.5 * clamp'.
            dlw = jnp.where(vis, 0.5, 0.0) * _clip_grad(dr)

            er = mask[0] * s_er
            eg = mask[1] * s_eg
            eb = mask[2] * s_eb
            if bounce == 0:
                cm = (_clip_grad(er), _clip_grad(eg), _clip_grad(eb))
                er = jnp.clip(er, 0.0, 1.0)
                eg = jnp.clip(eg, 0.0, 1.0)
                eb = jnp.clip(eb, 0.0, 1.0)
            else:
                cm = None
            sc_w = (s_cr, s_cg, s_cb)
            nee = tuple(dl * le[ch] * sc_w[ch] for ch in range(3))
            col[0] = col[0] + jnp.where(hit_now, er + mask[0] * nee[0], 0.0)
            col[1] = col[1] + jnp.where(hit_now, eg + mask[1] * nee[1], 0.0)
            col[2] = col[2] + jnp.where(hit_now, eb + mask[2] * nee[2], 0.0)

            entry = dict(
                hit=hit_now, idx=s_idx, mask=tuple(mask),
                e=(s_er, s_eg, s_eb), c=sc_w, cm=cm, dl=dl, dlw=dlw,
                t=t_best, o=(ox, oy, oz), d=(dx, dy, dz),
                p=(s_px, s_py, s_pz), rad=s_rad, sig=s_sig,
                n=(nx_, ny_, nz_), n_inv=n_inv, flip=flip,
                ld=(ldx, ldy, ldz), l_inv=l_inv, dr=dr,
                inv_len=inv_len, h=(hx, hy, hz),
            )

            mask[0] = jnp.where(hit_now, mask[0] * s_cr, mask[0])
            mask[1] = jnp.where(hit_now, mask[1] * s_cg, mask[1])
            mask[2] = jnp.where(hit_now, mask[2] * s_cb, mask[2])

            if bounce + 1 < max_bounces:
                u1 = draw(2 + 2 * bounce)
                u2 = draw(3 + 2 * bounce)
                use_a = jnp.abs(nx_) > jnp.abs(nz_)
                o1px = jnp.where(use_a, -ny_, 0.0)
                o1py = jnp.where(use_a, nx_, -nz_)
                o1pz = jnp.where(use_a, 0.0, ny_)
                o1_inv = jax.lax.rsqrt(
                    _dot3(o1px, o1py, o1pz, o1px, o1py, o1pz) + 1e-20
                )
                o1x, o1y, o1z = o1px * o1_inv, o1py * o1_inv, o1pz * o1_inv
                o2x = ny_ * o1z - nz_ * o1y
                o2y = nz_ * o1x - nx_ * o1z
                o2z = nx_ * o1y - ny_ * o1x
                phi = u1 * TWO_PI
                zc = jnp.sqrt(u2)
                sin_t = jnp.sqrt(jnp.maximum(1.0 - zc * zc, 0.0))
                cs, ss = jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t
                bdx = cs * o1x + ss * o2x + zc * nx_
                bdy = cs * o1y + ss * o2y + zc * ny_
                bdz = cs * o1z + ss * o2z + zc * nz_
                ox = jnp.where(hit_now, hx + nx_ * push, ox)
                oy = jnp.where(hit_now, hy + ny_ * push, oy)
                oz = jnp.where(hit_now, hz + nz_ * push, oz)
                dx = jnp.where(hit_now, bdx, dx)
                dy = jnp.where(hit_now, bdy, dy)
                dz = jnp.where(hit_now, bdz, dz)
                entry.update(
                    o1=(o1x, o1y, o1z), o1_inv=o1_inv, use_a=use_a,
                    cs=cs, ss=ss, zc=zc,
                )
            tape.append(entry)
            active = active & hit

        # ---- hand reverse sweep --------------------------------------
        # Per-channel-component cotangents: each geometric scalar's
        # cotangent is a length-C tuple (coefficients of g in fused mode;
        # the contracted value in replay mode). Vectors are 3-tuples of
        # those tuples' elements: vhat[comp][axis].
        def vzero():
            return [[zeros, zeros, zeros] for _ in range(C)]

        o_hat = vzero()
        d_hat = vzero()
        # Per-sample plain accumulators, Kahan-merged into the carry once
        # per sample (geometry partials cancel heavily — pallas_ad.py's
        # measured ~1% f32 drift at spp 32 without compensation).
        S = [zeros] * n_geom

        def s_geom(i, p):  # index into S: sphere i, param p (0=r,1..3=pos)
            return (i * 4 + p) * C

        EYE0 = 4 * num_spheres * C
        BAS0 = EYE0 + 3 * C

        for bounce in range(max_bounces - 1, -1, -1):
            tp = tape[bounce]
            hit_now = tp["hit"]
            hit_f = hit_now.astype(jnp.float32)
            m = tp["mask"]
            cc = tp["c"]
            nx_, ny_, nz_ = tp["n"]
            ldx, ldy, ldz = tp["ld"]
            ox_, oy_, oz_ = tp["o"]
            dx_, dy_, dz_ = tp["d"]
            hx, hy, hz = tp["h"]
            t_best = tp["t"]

            # Incoming (o', d') cotangents split: pass-through for non-hit
            # lanes; hit lanes flow into h/n/sampling chains.
            h_hat = [[zeros, zeros, zeros] for _ in range(C)]
            n_hat = [[zeros, zeros, zeros] for _ in range(C)]
            if bounce + 1 < max_bounces:
                zc, cs, ss = tp["zc"], tp["cs"], tp["ss"]
                o1x, o1y, o1z = tp["o1"]
                o1_inv = tp["o1_inv"]
                use_a = tp["use_a"]
                o2x = ny_ * o1z - nz_ * o1y
                o2y = nz_ * o1x - nx_ * o1z
                o2z = nx_ * o1y - ny_ * o1x
                for k in range(C):
                    ohx = jnp.where(hit_now, o_hat[k][0], 0.0)
                    ohy = jnp.where(hit_now, o_hat[k][1], 0.0)
                    ohz = jnp.where(hit_now, o_hat[k][2], 0.0)
                    dhx = jnp.where(hit_now, d_hat[k][0], 0.0)
                    dhy = jnp.where(hit_now, d_hat[k][1], 0.0)
                    dhz = jnp.where(hit_now, d_hat[k][2], 0.0)
                    # o' = h + n*push ; d' = cs*o1 + ss*o2 + zc*n
                    h_hat[k][0] += ohx
                    h_hat[k][1] += ohy
                    h_hat[k][2] += ohz
                    n_hat[k][0] += push * ohx + zc * dhx
                    n_hat[k][1] += push * ohy + zc * dhy
                    n_hat[k][2] += push * ohz + zc * dhz
                    t1x, t1y, t1z = cs * dhx, cs * dhy, cs * dhz  # o1-hat
                    t2x, t2y, t2z = ss * dhx, ss * dhy, ss * dhz  # o2-hat
                    # o2 = n x o1:  n_hat += o1 x o2_hat ; o1_hat += o2_hat x n
                    n_hat[k][0] += o1y * t2z - o1z * t2y
                    n_hat[k][1] += o1z * t2x - o1x * t2z
                    n_hat[k][2] += o1x * t2y - o1y * t2x
                    t1x += t2y * nz_ - t2z * ny_
                    t1y += t2z * nx_ - t2x * nz_
                    t1z += t2x * ny_ - t2y * nx_
                    # o1 = o1p * o1_inv (normalize):
                    s_ = o1x * t1x + o1y * t1y + o1z * t1z
                    p1x = o1_inv * (t1x - o1x * s_)
                    p1y = o1_inv * (t1y - o1y * s_)
                    p1z = o1_inv * (t1z - o1z * s_)
                    # o1p = use_a ? (-ny, nx, 0) : (0, -nz, ny)
                    n_hat[k][0] += jnp.where(use_a, p1y, 0.0)
                    n_hat[k][1] += jnp.where(use_a, -p1x, p1z)
                    n_hat[k][2] += jnp.where(use_a, 0.0, -p1y)
                    # pass-through for non-hit lanes
                    o_hat[k][0] = jnp.where(hit_now, 0.0, o_hat[k][0])
                    o_hat[k][1] = jnp.where(hit_now, 0.0, o_hat[k][1])
                    o_hat[k][2] = jnp.where(hit_now, 0.0, o_hat[k][2])
                    d_hat[k][0] = jnp.where(hit_now, 0.0, d_hat[k][0])
                    d_hat[k][1] = jnp.where(hit_now, 0.0, d_hat[k][1])
                    d_hat[k][2] = jnp.where(hit_now, 0.0, d_hat[k][2])

            # NEE Lambert source: wdr[k] = dC/d(dr) coefficient.
            dlw = tp["dlw"]
            if mode == "fused":
                wdr = tuple(
                    hit_f * m[ch] * le[ch] * cc[ch] * dlw for ch in range(3)
                )
            else:
                wdr = (
                    hit_f * dlw * (
                        g_known[0] * m[0] * le[0] * cc[0]
                        + g_known[1] * m[1] * le[1] * cc[1]
                        + g_known[2] * m[2] * le[2] * cc[2]
                    ),
                )
            # dr = dot(ld, n):  ld_hat = wdr*n ; n_hat += wdr*ld.
            # ld = lv * l_inv with lv = lb - h: the normalize pullback of
            # a scalar-times-fixed-vector cotangent collapses to
            # lv_hat[k] = wdr[k] * bv, with bv shared across components.
            l_inv = tp["l_inv"]
            dr = tp["dr"]
            bvx = l_inv * (nx_ - ldx * dr)
            bvy = l_inv * (ny_ - ldy * dr)
            bvz = l_inv * (nz_ - ldz * dr)
            for k in range(C):
                n_hat[k][0] += wdr[k] * ldx
                n_hat[k][1] += wdr[k] * ldy
                n_hat[k][2] += wdr[k] * ldz
                lvx_h = wdr[k] * bvx
                lvy_h = wdr[k] * bvy
                lvz_h = wdr[k] * bvz
                h_hat[k][0] -= lvx_h
                h_hat[k][1] -= lvy_h
                h_hat[k][2] -= lvz_h
                # lb = (l_px, l_py - l_rad, l_pz)
                S[s_geom(li, 1) + k] += lvx_h
                S[s_geom(li, 2) + k] += lvy_h
                S[s_geom(li, 3) + k] += lvz_h
                S[s_geom(li, 0) + k] -= lvy_h

            # normal: n = flip * (n_pre * n_inv), n_pre = h - p_w
            n_inv = tp["n_inv"]
            flip = tp["flip"]
            nux, nuy, nuz = nx_ * flip, ny_ * flip, nz_ * flip
            p_hat = [[zeros, zeros, zeros] for _ in range(C)]  # winner pos
            r_hat = [zeros] * C  # winner radius
            for k in range(C):
                ax = flip * n_hat[k][0]
                ay = flip * n_hat[k][1]
                az = flip * n_hat[k][2]
                s_ = nux * ax + nuy * ay + nuz * az
                px_ = n_inv * (ax - nux * s_)
                py_ = n_inv * (ay - nuy * s_)
                pz_ = n_inv * (az - nuz * s_)
                h_hat[k][0] += px_
                h_hat[k][1] += py_
                h_hat[k][2] += pz_
                p_hat[k][0] -= px_
                p_hat[k][1] -= py_
                p_hat[k][2] -= pz_

            # h = o + d*t
            t_hat = [zeros] * C
            for k in range(C):
                o_hat[k][0] += h_hat[k][0]
                o_hat[k][1] += h_hat[k][1]
                o_hat[k][2] += h_hat[k][2]
                d_hat[k][0] += t_best * h_hat[k][0]
                d_hat[k][1] += t_best * h_hat[k][1]
                d_hat[k][2] += t_best * h_hat[k][2]
                t_hat[k] = (
                    dx_ * h_hat[k][0] + dy_ * h_hat[k][1] + dz_ * h_hat[k][2]
                )

            # t chain (winner only). Every per-channel cotangent is
            # t̂_u[k] times a CHANNEL-INDEPENDENT gradient vector, so the
            # closed-form k_p/k_d/k_r are computed once and the per-
            # channel work is four scalar-times-vector FMAs:
            #   t_u = tca + sig*sqrt(r^2 - |q|^2),  q = rel - tca*dn
            #   k_p = corr*dn - a*q        (= -k_o)
            #   k_d = corr*rel + tca*a*q
            #   k_r = a*r
            # with a = sig/thc (det>0-gated) and corr = 1 + a*(q.dn).
            inv_len = tp["inv_len"]
            if inv_len is None:
                dnx, dny, dnz = dx_, dy_, dz_
            else:
                dnx, dny, dnz = dx_ * inv_len, dy_ * inv_len, dz_ * inv_len
            s_px, s_py, s_pz = tp["p"]
            relx, rely, relz = s_px - ox_, s_py - oy_, s_pz - oz_
            tca = _dot3(relx, rely, relz, dnx, dny, dnz)
            qx = relx - tca * dnx
            qy = rely - tca * dny
            qz = relz - tca * dnz
            d2 = _dot3(qx, qy, qz, qx, qy, qz)
            rad_w = tp["rad"]
            det = rad_w * rad_w - d2
            gate = det > 0.0
            inv_thc = jnp.where(
                gate, jax.lax.rsqrt(jnp.where(gate, det, 1.0)), 0.0
            )
            sig = tp["sig"]
            a_ = sig * inv_thc
            ux, uy, uz = a_ * qx, a_ * qy, a_ * qz
            corr = 1.0 + _dot3(ux, uy, uz, dnx, dny, dnz)
            kpx = corr * dnx - ux
            kpy = corr * dny - uy
            kpz = corr * dnz - uz
            kdx = corr * relx + tca * ux
            kdy = corr * rely + tca * uy
            kdz = corr * relz + tca * uz
            kr = a_ * rad_w
            dn_hat = [[zeros, zeros, zeros] for _ in range(C)]
            il_hat = [zeros] * C  # inv_len cotangent (bounce 0)
            if inv_len is not None:
                t_u = t_best / inv_len  # shared across components
            for k in range(C):
                if inv_len is None:
                    tu_hat = t_hat[k]
                else:
                    # t = t_u * inv_len
                    tu_hat = t_hat[k] * inv_len
                    il_hat[k] += t_hat[k] * t_u
                r_hat[k] += tu_hat * kr
                p_hat[k][0] += tu_hat * kpx
                p_hat[k][1] += tu_hat * kpy
                p_hat[k][2] += tu_hat * kpz
                o_hat[k][0] -= tu_hat * kpx
                o_hat[k][1] -= tu_hat * kpy
                o_hat[k][2] -= tu_hat * kpz
                dn_hat[k][0] += tu_hat * kdx
                dn_hat[k][1] += tu_hat * kdy
                dn_hat[k][2] += tu_hat * kdz

            if inv_len is None:
                for k in range(C):
                    d_hat[k][0] += dn_hat[k][0]
                    d_hat[k][1] += dn_hat[k][1]
                    d_hat[k][2] += dn_hat[k][2]
            else:
                # dn = d * inv_len; inv_len = rsqrt(d.d)
                il3 = inv_len * inv_len * inv_len
                for k in range(C):
                    il_hat[k] += (
                        dx_ * dn_hat[k][0] + dy_ * dn_hat[k][1]
                        + dz_ * dn_hat[k][2]
                    )
                    sdot = -il3 * il_hat[k]  # d(inv_len)/d(s) * il_hat * 2 / 2
                    d_hat[k][0] += inv_len * dn_hat[k][0] + sdot * dx_
                    d_hat[k][1] += inv_len * dn_hat[k][1] + sdot * dy_
                    d_hat[k][2] += inv_len * dn_hat[k][2] + sdot * dz_

            # scatter winner geometry cotangents into per-sphere slots
            s_idx = tp["idx"]
            for i in range(num_spheres):
                sel = jnp.where(hit_now & (s_idx == i), 1.0, 0.0)
                for k in range(C):
                    S[s_geom(i, 0) + k] += sel * r_hat[k]
                    S[s_geom(i, 1) + k] += sel * p_hat[k][0]
                    S[s_geom(i, 2) + k] += sel * p_hat[k][1]
                    S[s_geom(i, 3) + k] += sel * p_hat[k][2]

        # camera: o_0 -> eye ; d_0 = bilerp(basis) with weights w**
        for k in range(C):
            S[EYE0 + 0 * C + k] += o_hat[k][0]
            S[EYE0 + 1 * C + k] += o_hat[k][1]
            S[EYE0 + 2 * C + k] += o_hat[k][2]
            for corner, w_ in enumerate((w00, w10, w01, w11)):
                for ax in range(3):
                    S[BAS0 + (corner * 3 + ax) * C + k] += w_ * d_hat[k][ax]

        # ---- shading sweep (product chain + NEE terms) ----------------
        # h_bar = suffix derivative w.r.t. the CURRENT mask; channel-
        # aligned like the diffuse kernel's (pallas_grad.py:580-588).
        hb = [zeros, zeros, zeros]
        for bounce in range(max_bounces - 1, -1, -1):
            tp = tape[bounce]
            hit_now = tp["hit"]
            hit_f = hit_now.astype(jnp.float32)
            m = tp["mask"]
            e = tp["e"]
            cc = tp["c"]
            cm = tp["cm"]
            dl = tp["dl"]
            s_idx = tp["idx"]
            cmv = cm if cm is not None else (1.0, 1.0, 1.0)
            ae = tuple(hit_f * m[ch] * cmv[ch] for ch in range(3))
            acb = tuple(
                hit_f * m[ch] * (dl * le[ch] + hb[ch]) for ch in range(3)
            )
            al = tuple(hit_f * m[ch] * dl * cc[ch] for ch in range(3))
            if mode == "replay":
                ae = tuple(g_known[ch] * ae[ch] for ch in range(3))
                acb = tuple(g_known[ch] * acb[ch] for ch in range(3))
                al = tuple(g_known[ch] * al[ch] for ch in range(3))
            for i in range(num_spheres):
                sel = jnp.where(hit_now & (s_idx == i), 1.0, 0.0)
                for ch in range(3):
                    acc[i * 6 + ch] += sel * ae[ch]
                    acc[i * 6 + 3 + ch] += sel * acb[ch]
            # light emission rides in the light sphere's emission slot
            for ch in range(3):
                acc[li * 6 + ch] += al[ch]
            for ch in range(3):
                hb[ch] = jnp.where(
                    hit_now,
                    cmv[ch] * e[ch] + (dl * le[ch] + hb[ch]) * cc[ch],
                    hb[ch],
                )

        # ---- Kahan-merge the sample's geometry partials ----------------
        for j in range(n_geom):
            s_ = acc[n_shade + j]
            comp = acc[n_shade + n_geom + j]
            y = S[j] - comp
            t_ = s_ + y
            acc[n_shade + n_geom + j] = (t_ - s_) - y
            acc[n_shade + j] = t_

        if mode == "fused":
            acc[n_shade + 2 * n_geom + 0] += col[0]
            acc[n_shade + 2 * n_geom + 1] += col[1]
            acc[n_shade + 2 * n_geom + 2] += col[2]
        return tuple(acc)

    init = (zeros,) * n_carry
    acc = list(jax.lax.fori_loop(0, spp, sample_body, init, unroll=False))

    # ---- epilogue: contract with the cotangent, reduce, write block ----
    inv_spp = 1.0 / spp
    n_geom = (4 * num_spheres + 15) * C
    n_shade = 6 * num_spheres
    if mode == "fused":
        mean = [acc[n_shade + 2 * n_geom + ch] * inv_spp for ch in range(3)]
        color_ref[0] = mean[0]
        color_ref[1] = mean[1]
        color_ref[2] = mean[2]
        res = [
            jnp.where(in_image, mean[ch] - target_ref[ch], 0.0)
            for ch in range(3)
        ]
        loss_part = jnp.sum(res[0] * res[0] + res[1] * res[1] + res[2] * res[2])
        g = [2.0 * res[ch] * inv_spp for ch in range(3)]
    else:
        g = None

    def contract_geom(base):
        # -> scalar: sum over pixels of sum_k coeff[k] * g[k] (fused) or
        # the single accumulated component (replay).
        if mode == "fused":
            return jnp.sum(
                acc[base] * g[0] + acc[base + 1] * g[1] + acc[base + 2] * g[2]
            )
        return jnp.sum(acc[base])

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (GRAD_ROWS, GRAD_COLS), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (GRAD_ROWS, GRAD_COLS), 1)
    update = jnp.zeros((GRAD_ROWS, GRAD_COLS), jnp.float32)

    def put(row, colm, val):
        return update + jnp.where((row_ids == row) & (col_ids == colm), val, 0.0)

    for i in range(num_spheres):
        for p in range(4):  # col 0 radius, cols 1..3 position
            update = put(i, p, contract_geom(n_shade + (i * 4 + p) * C))
        for ch in range(3):
            if mode == "fused":
                d_e = jnp.sum(g[ch] * acc[i * 6 + ch])
                d_c = jnp.sum(g[ch] * acc[i * 6 + 3 + ch])
            else:
                d_e = jnp.sum(acc[i * 6 + ch])
                d_c = jnp.sum(acc[i * 6 + 3 + ch])
            update = put(i, 4 + ch, d_e)
            update = put(i, 7 + ch, d_c)
    EYE0 = n_shade + 4 * num_spheres * C
    for ax in range(3):
        update = put(num_spheres, ax, contract_geom(EYE0 + ax * C))
    BAS0 = EYE0 + 3 * C
    for corner in range(4):
        for ax in range(3):
            update = put(
                num_spheres + 1 + corner, ax,
                contract_geom(BAS0 + (corner * 3 + ax) * C),
            )
    if mode == "fused":
        update = put(num_spheres, LOSS_COL, loss_part)

    grad_ref[0] = update


# -- launch plumbing ---------------------------------------------------------

def _launch_nee_grads(
    scene,
    cam,
    cfg: RenderConfig,
    seed_arr,
    *,
    mode: str,
    spp: int,
    local_h: int,
    target=None,  # fused: [3, local_h, W]
    ct_block=None,  # replay: [3, local_h, W] per-SAMPLE cotangents
    interpret: bool,
):
    """pallas_call plumbing. Returns the per-tile-summed raw
    [GRAD_ROWS, GRAD_COLS] block (+ the [local_h, W, 3] mean color in
    fused mode). Per-tile partial blocks are tree-summed by the host for
    the same cancellation reason as pallas_ad.py's epilogue."""
    tile_h, tile_w, pad_h, pad_w = tile_dims(cfg, local_h)
    if scene.num_objects + 5 > GRAD_ROWS:
        raise ValueError("scene too large for the gradient block layout")
    scene_params = _pack_scene(scene)
    basis = cam.eye_ray_basis(cfg.width, cfg.height)
    cam_params = jnp.concatenate([cam.position[None, :], basis], axis=0)

    grid = (pad_h // tile_h, pad_w // tile_w)
    n_gw = grid[1]
    kernel = functools.partial(
        _nee_grad_kernel,
        mode=mode,
        num_spheres=scene.num_objects,
        spp=spp,
        max_bounces=cfg.max_bounces,
        jitter=cfg.resolved_jitter,
        push=cfg.push_ray_origin,
        tile_h=tile_h,
        tile_w=tile_w,
        height=cfg.height,
        width=cfg.width,
        light_index=cfg.light_index,
    )
    tile_spec = pl.BlockSpec(
        (3, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
    )
    block_spec = pl.BlockSpec(
        (1, GRAD_ROWS, GRAD_COLS),
        lambda i, j, n_gw=n_gw: (i * n_gw + j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    block_shape = jax.ShapeDtypeStruct(
        (grid[0] * grid[1], GRAD_ROWS, GRAD_COLS), jnp.float32
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        # The symbolic sweep carries ~(6 + 8*C)N + 30*C accumulator tiles
        # plus the unrolled 5-bounce tape; like the AD kernel this exceeds
        # the default 16 MiB scoped-vmem budget at wide tiles.
        vmem_limit_bytes=100 * 1024 * 1024,
    )
    if mode == "fused":
        tgt = jnp.pad(
            target,
            ((0, 0), (0, pad_h - target.shape[1]), (0, pad_w - target.shape[2])),
        )
        per_tile, color = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[smem, smem, smem, tile_spec],
            out_specs=[block_spec, tile_spec],
            out_shape=[
                block_shape,
                jax.ShapeDtypeStruct((3, pad_h, pad_w), jnp.float32),
            ],
            compiler_params=compiler_params,
            interpret=interpret_param(interpret),
        )(scene_params, cam_params, seed_arr, tgt)
        color = jnp.moveaxis(color[:, :local_h, : cfg.width], 0, -1)
        return jnp.sum(per_tile, axis=0), color
    ct = jnp.pad(
        ct_block,
        ((0, 0), (0, pad_h - ct_block.shape[1]), (0, pad_w - ct_block.shape[2])),
    )
    per_tile = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem, smem, smem, tile_spec],
        out_specs=block_spec,
        out_shape=block_shape,
        compiler_params=compiler_params,
        interpret=interpret_param(interpret),
    )(scene_params, cam_params, seed_arr, ct)
    return jnp.sum(per_tile, axis=0)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def nee_loss_and_grads_pallas(
    scene, cam, cfg: RenderConfig, frame, target, interpret: bool = False
):
    """(loss, (d_scene, d_camera)) of the mean-squared pixel color loss for
    NEE diffuse configs — ONE trajectory pass, all parameters (see module
    docstring). Same contract as ad_loss_and_grads_pallas; ~2x its speed."""
    from pathtrace_tpu.ops.pallas_ad import grads_from_block

    if not cfg.nee or cfg.brdf != "diffuse":
        raise ValueError("nee_loss_and_grads_pallas requires nee=True, diffuse")
    seed_arr = make_seed_array(cfg, frame)
    tgt = jnp.moveaxis(target, -1, 0)
    block, color = _launch_nee_grads(
        scene, cam, cfg, seed_arr, mode="fused", spp=cfg.spp,
        local_h=cfg.height, target=tgt, interpret=interpret,
    )
    n = scene.num_objects
    denom = cfg.height * cfg.width * 3
    loss = block[n, LOSS_COL] / denom
    d_scene, d_cam = grads_from_block(scene, cam, cfg, block / denom)
    return loss, (d_scene, d_cam)


def nee_grads_block_slab(
    scene,
    cam,
    cfg: RenderConfig,
    frame,
    ct_block,
    row_offset=0,
    local_h: int | None = None,
    spp: int | None = None,
    sample_offset=0,
    interpret: bool = False,
):
    """Raw [GRAD_ROWS, GRAD_COLS] block for an image slab / sample range
    against a KNOWN per-SAMPLE color cotangent [3, local_h, W] (1/global-
    spp folded by the caller) — the shard_map hook replacing the vjp
    replay (``ad_grads_block_slab``) for NEE diffuse configs at ~60% of
    its cost. Blocks from different shards sum (then psum)."""
    local_h = cfg.height if local_h is None else local_h
    spp = cfg.spp if spp is None else spp
    seed_arr = make_seed_array(cfg, frame, sample_offset, row_offset)
    return _launch_nee_grads(
        scene, cam, cfg, seed_arr, mode="replay", spp=spp,
        local_h=local_h, ct_block=ct_block, interpret=interpret,
    )
