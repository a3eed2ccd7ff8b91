"""Pallas backward pass: color-loss gradients w.r.t. emission and albedo.

The TPU-native reverse sweep pairing ops/pallas_trace.py. Under the
detached-decision estimator (no NEE), a path's radiance is

    L = sum_n  mask_n * e_{idx_n},   mask_{n+1} = mask_n * c_{idx_n}

— a pure product chain in the hit spheres' emission/albedo; its gradient
w.r.t. *geometry* (positions, radii, camera) is exactly zero (grad.py
docs), so the backward kernel needs NO geometry residuals. Each sample's
trajectory is recomputed from the shared counter-based RNG lattice
(bit-identical to the forward kernel's — the math below mirrors
_pathtrace_kernel exactly, including its bounce-0-only inv_len and skipped
renormalizations), the per-bounce (hit, idx, mask, e, c) tape lives in
registers across the unrolled bounces, and the reverse recurrence

    gbar_n = hit_n ? g*clamp'*e_n + c_n*gbar_{n+1} : gbar_{n+1}
    dL/de_{idx_n} += hit_n * mask_n * g * clamp'_n
    dL/dc_{idx_n} += hit_n * mask_n * gbar_{n+1}

accumulates into per-sphere scalars, reduced across the sequential TPU
grid into one shared (16, 128) output block (rows = spheres, cols 0-2 =
d emission, 3-5 = d albedo).

Validation: tests/test_pallas_grad.py checks these against jnp reverse-mode
AD on the SAME sample lattice.

Two kernels share the machinery:

- ``_color_grad_kernel`` — replay against an ARBITRARY per-pixel cotangent
  (the building block of the cross-estimator), a second trajectory pass.
- ``_fused_loss_grad_kernel`` — the fast path for the MSE pixel loss:
  because the gradient is linear in the cotangent and the cotangent is
  constant across a pixel's spp samples, cotangent-free contributions
  accumulate during ONE forward pass and are contracted against the
  cotangent (formed in-kernel from the just-computed mean color) at the
  end — fwd+bwd for the cost of a single color-only render.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtrace_tpu.config import RenderConfig
from pathtrace_tpu.ops.pallas_trace import (
    interpret_param,
    make_seed_array,
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
)

GRAD_ROWS = 16  # >= num_spheres, sublane-aligned
GRAD_COLS = 128  # lane-aligned; cols 0-2 d_emission, 3-5 d_color


def _color_grad_kernel(
    scene_ref,  # SMEM [N, 10]
    cam_ref,  # SMEM [5, 3]
    seed_ref,  # SMEM [5]: seed, frame, sample/row/col offsets
    ct_ref,  # VMEM [3, TH, TW]: dL/d(color sum) per pixel (1/spp folded in)
    grad_ref,  # VMEM [GRAD_ROWS, GRAD_COLS]: shared accumulator block
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
):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    first = (ti == 0) & (tj == 0)

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

    def bilerp_basis(axis, u, v):
        b00, b10 = cam_ref[1, axis], cam_ref[2, axis]
        b01, b11 = cam_ref[3, axis], cam_ref[4, axis]
        bottom = b00 * (1.0 - u) + b10 * u
        top = b01 * (1.0 - u) + b11 * u
        return bottom * (1.0 - v) + top * v

    zeros = jnp.zeros(shape, jnp.float32)
    # Mask out-of-image pad lanes so they contribute nothing.
    in_image = (rows_i < height) & (cols_i < width)
    g_r = jnp.where(in_image, ct_ref[0], 0.0)
    g_g = jnp.where(in_image, ct_ref[1], 0.0)
    g_b = jnp.where(in_image, ct_ref[2], 0.0)

    def sample_body(s, carry):
        s_u = sample_offset + s

        def draw(slot):
            dk = _mix32(base_key ^ ((s_u * n_slots + jnp.int32(slot)) * _P_GOLD))
            return _uniform_01(pix_key, dk)

        acc = list(carry)

        # -- forward trajectory recompute (mirrors _pathtrace_kernel) ------
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
        ox = jnp.full(shape, eye_x)
        oy = jnp.full(shape, eye_y)
        oz = jnp.full(shape, eye_z)

        mask_r = jnp.ones(shape, jnp.float32)
        mask_g = jnp.ones(shape, jnp.float32)
        mask_b = jnp.ones(shape, jnp.float32)
        active = jnp.ones(shape, bool)

        tape = []  # per bounce: (hit_now, idx, mask_rgb, e_rgb, c_rgb, cm_rgb)

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
            s_px = s_py = s_pz = zeros
            s_er = s_eg = s_eb = zeros
            s_cr = s_cg = s_cb = zeros
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
                s_idx = jnp.where(closer, i, s_idx)
                s_px = jnp.where(closer, px, s_px)
                s_py = jnp.where(closer, py, s_py)
                s_pz = jnp.where(closer, pz, s_pz)
                s_er = jnp.where(closer, scene_ref[i, 4], s_er)
                s_eg = jnp.where(closer, scene_ref[i, 5], s_eg)
                s_eb = jnp.where(closer, scene_ref[i, 6], s_eb)
                s_cr = jnp.where(closer, scene_ref[i, 7], s_cr)
                s_cg = jnp.where(closer, scene_ref[i, 8], s_cg)
                s_cb = jnp.where(closer, scene_ref[i, 9], s_cb)

            hit_now = active & hit

            if bounce == 0:
                # clamp'(mask*e) matching jnp.clip's subgradient exactly:
                # 1 inside (0, 1), 0 outside, and 0.5 AT the boundaries
                # (lax.max/min tie-split — walls with e == 0 land on v == 0
                # every bounce-0 hit, so this convention is load-bearing).
                def _clip_grad(v):
                    inside = ((v >= 0.0) & (v <= 1.0)).astype(jnp.float32)
                    on_edge = ((v == 0.0) | (v == 1.0)).astype(jnp.float32)
                    return inside - 0.5 * on_edge

                vr, vg, vb = mask_r * s_er, mask_g * s_eg, mask_b * s_eb
                cm = (_clip_grad(vr), _clip_grad(vg), _clip_grad(vb))
            else:
                cm = None
            tape.append(
                (
                    hit_now,
                    s_idx,
                    (mask_r, mask_g, mask_b),
                    (s_er, s_eg, s_eb),
                    (s_cr, s_cg, s_cb),
                    cm,
                )
            )

            mask_r = jnp.where(hit_now, mask_r * s_cr, mask_r)
            mask_g = jnp.where(hit_now, mask_g * s_cg, mask_g)
            mask_b = jnp.where(hit_now, mask_b * s_cb, mask_b)

            if bounce + 1 < max_bounces:
                hx = ox + dx * t_best
                hy = oy + dy * t_best
                hz = oz + dz * t_best
                nx_, ny_, nz_ = hx - s_px, hy - s_py, hz - s_pz
                n_inv = jax.lax.rsqrt(_dot3(nx_, ny_, nz_, nx_, ny_, nz_) + 1e-20)
                nx_, ny_, nz_ = nx_ * n_inv, ny_ * n_inv, nz_ * n_inv
                flip = jnp.where(_dot3(nx_, ny_, nz_, dx, dy, dz) < 0.0, 1.0, -1.0)
                nx_, ny_, nz_ = nx_ * flip, ny_ * flip, nz_ * flip

                u1 = draw(2 + 2 * bounce)
                u2 = draw(3 + 2 * bounce)
                use_a = jnp.abs(nx_) > jnp.abs(nz_)
                o1x = jnp.where(use_a, -ny_, 0.0)
                o1y = jnp.where(use_a, nx_, -nz_)
                o1z = jnp.where(use_a, 0.0, ny_)
                o1_inv = jax.lax.rsqrt(_dot3(o1x, o1y, o1z, o1x, o1y, o1z) + 1e-20)
                o1x, o1y, o1z = o1x * o1_inv, o1y * o1_inv, o1z * o1_inv
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

        # -- reverse product-chain sweep -----------------------------------
        gbar_r = zeros
        gbar_g = zeros
        gbar_b = zeros
        for bounce in range(max_bounces - 1, -1, -1):
            hit_now, s_idx, (m_r, m_g, m_b), (e_r, e_g, e_b), (c_r, c_g, c_b), cm = tape[bounce]
            hit_f = hit_now.astype(jnp.float32)
            if cm is not None:
                ge_base = (
                    hit_f * m_r * g_r * cm[0],
                    hit_f * m_g * g_g * cm[1],
                    hit_f * m_b * g_b * cm[2],
                )
                g_eff = (g_r * cm[0], g_g * cm[1], g_b * cm[2])
            else:
                ge_base = (hit_f * m_r * g_r, hit_f * m_g * g_g, hit_f * m_b * g_b)
                g_eff = (g_r, g_g, g_b)
            gc_base = (hit_f * m_r * gbar_r, hit_f * m_g * gbar_g, hit_f * m_b * gbar_b)
            # Tile-shaped accumulators: masked multiply-adds on the VPU.
            # The expensive cross-lane reductions happen ONCE after the spp
            # loop (in the caller below), not 6*N times per sample.
            for i in range(num_spheres):
                sel = jnp.where(hit_now & (s_idx == i), 1.0, 0.0)
                acc[i * 6 + 0] += sel * ge_base[0]
                acc[i * 6 + 1] += sel * ge_base[1]
                acc[i * 6 + 2] += sel * ge_base[2]
                acc[i * 6 + 3] += sel * gc_base[0]
                acc[i * 6 + 4] += sel * gc_base[1]
                acc[i * 6 + 5] += sel * gc_base[2]
            # gbar_n = hit ? g*clamp'*e + c*gbar : gbar
            gbar_r = jnp.where(hit_now, g_eff[0] * e_r + c_r * gbar_r, gbar_r)
            gbar_g = jnp.where(hit_now, g_eff[1] * e_g + c_g * gbar_g, gbar_g)
            gbar_b = jnp.where(hit_now, g_eff[2] * e_b + c_b * gbar_b, gbar_b)

        return tuple(acc)

    init = (zeros,) * (num_spheres * 6)
    acc_tiles = jax.lax.fori_loop(0, spp, sample_body, init, unroll=False)
    acc = [jnp.sum(a) for a in acc_tiles]

    @pl.when(first)
    def _():
        grad_ref[...] = jnp.zeros((GRAD_ROWS, GRAD_COLS), jnp.float32)

    # Sequential grid: accumulate this tile's contribution via a dense add
    # (scalar scatter into VMEM is slow on TPU; build the update as an
    # outer-product-free masked broadcast instead).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (GRAD_ROWS, GRAD_COLS), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (GRAD_ROWS, GRAD_COLS), 1)
    update = jnp.zeros((GRAD_ROWS, GRAD_COLS), jnp.float32)
    for i in range(num_spheres):
        for ch in range(6):
            update = update + jnp.where(
                (row_ids == i) & (col_ids == ch), acc[i * 6 + ch], 0.0
            )
    grad_ref[...] += update


def _fused_loss_grad_kernel(
    scene_ref,  # SMEM [N, 10]
    cam_ref,  # SMEM [5, 3]
    seed_ref,  # SMEM [5]: seed, frame, sample/row/col offsets
    *refs,  # fused: (target, grad, color); dump: (acc, color)
    mode: str = "fused",
    num_spheres: int,
    spp: int,
    max_bounces: int,
    jitter: bool,
    push: float,
    tile_h: int,
    tile_w: int,
    height: int,
    width: int,
):
    """Fused forward + backward in ONE trajectory pass.

    The MSE pixel-loss gradient is linear in the per-pixel cotangent
    g = 2(mean - target)/denom, and g is constant across a pixel's spp
    samples. So instead of rendering forward and then REPLAYING every
    trajectory against a known cotangent (two passes — what
    ``render_color_grads_pallas`` does for arbitrary cotangents), this
    kernel accumulates the cotangent-free per-sphere contributions

        A_e[i] += hit * sel_i * mask_n * clamp'_n          (d emission)
        A_c[i] += hit * sel_i * mask_n * h_{n+1}           (d albedo)
        h_n     = hit ? clamp'_n * e_n + c_n * h_{n+1} : h_{n+1}

    during the SAME in-register reverse sweep that follows each sample's
    forward bounce chain, alongside the color sums. After the spp loop the
    pixel cotangent is formed from the now-known mean color and the
    per-pixel accumulators are contracted against it. Gradients match the
    two-pass kernel exactly (same lattice, same clamp subgradient); cost
    drops from fwd(14-ch AOVs) + replay to ONE color-only pass.

    mode="dump" skips the in-kernel contraction and instead writes the raw
    per-pixel accumulator tiles [6N, TH, TW] (+ the mean color) to HBM, so
    a jnp epilogue can contract them against ANY per-pixel cotangent —
    this makes the cross-estimator inverse step two trajectory passes
    instead of four.
    """
    if mode == "fused":
        target_ref, grad_ref, color_ref = refs
    else:
        acc_ref, color_ref = refs
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    first = (ti == 0) & (tj == 0)

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

    def bilerp_basis(axis, u, v):
        b00, b10 = cam_ref[1, axis], cam_ref[2, axis]
        b01, b11 = cam_ref[3, axis], cam_ref[4, axis]
        bottom = b00 * (1.0 - u) + b10 * u
        top = b01 * (1.0 - u) + b11 * u
        return bottom * (1.0 - v) + top * v

    zeros = jnp.zeros(shape, jnp.float32)
    in_image = (rows_i < height) & (cols_i < width)

    def sample_body(s, carry):
        s_u = sample_offset + s

        def draw(slot):
            dk = _mix32(base_key ^ ((s_u * n_slots + jnp.int32(slot)) * _P_GOLD))
            return _uniform_01(pix_key, dk)

        acc = list(carry)

        # -- forward trajectory (identical math to _pathtrace_kernel) ------
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

        tape = []  # per bounce: (hit_now, idx, mask_rgb, e_rgb, c_rgb, cm_rgb)

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
            s_px = s_py = s_pz = zeros
            s_er = s_eg = s_eb = zeros
            s_cr = s_cg = s_cb = zeros
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
                s_idx = jnp.where(closer, i, s_idx)
                s_px = jnp.where(closer, px, s_px)
                s_py = jnp.where(closer, py, s_py)
                s_pz = jnp.where(closer, pz, s_pz)
                s_er = jnp.where(closer, scene_ref[i, 4], s_er)
                s_eg = jnp.where(closer, scene_ref[i, 5], s_eg)
                s_eb = jnp.where(closer, scene_ref[i, 6], s_eb)
                s_cr = jnp.where(closer, scene_ref[i, 7], s_cr)
                s_cg = jnp.where(closer, scene_ref[i, 8], s_cg)
                s_cb = jnp.where(closer, scene_ref[i, 9], s_cb)

            hit_now = active & hit

            er = mask_r * s_er
            eg = mask_g * s_eg
            eb = mask_b * s_eb
            if bounce == 0:

                def _clip_grad(v):
                    inside = ((v >= 0.0) & (v <= 1.0)).astype(jnp.float32)
                    on_edge = ((v == 0.0) | (v == 1.0)).astype(jnp.float32)
                    return inside - 0.5 * on_edge

                cm = (_clip_grad(er), _clip_grad(eg), _clip_grad(eb))
                er = jnp.clip(er, 0.0, 1.0)
                eg = jnp.clip(eg, 0.0, 1.0)
                eb = jnp.clip(eb, 0.0, 1.0)
            else:
                cm = None
            col_r = col_r + jnp.where(hit_now, er, 0.0)
            col_g = col_g + jnp.where(hit_now, eg, 0.0)
            col_b = col_b + jnp.where(hit_now, eb, 0.0)

            tape.append(
                (
                    hit_now,
                    s_idx,
                    (mask_r, mask_g, mask_b),
                    (s_er, s_eg, s_eb),
                    (s_cr, s_cg, s_cb),
                    cm,
                )
            )

            mask_r = jnp.where(hit_now, mask_r * s_cr, mask_r)
            mask_g = jnp.where(hit_now, mask_g * s_cg, mask_g)
            mask_b = jnp.where(hit_now, mask_b * s_cb, mask_b)

            if bounce + 1 < max_bounces:
                hx = ox + dx * t_best
                hy = oy + dy * t_best
                hz = oz + dz * t_best
                nx_, ny_, nz_ = hx - s_px, hy - s_py, hz - s_pz
                n_inv = jax.lax.rsqrt(_dot3(nx_, ny_, nz_, nx_, ny_, nz_) + 1e-20)
                nx_, ny_, nz_ = nx_ * n_inv, ny_ * n_inv, nz_ * n_inv
                flip = jnp.where(_dot3(nx_, ny_, nz_, dx, dy, dz) < 0.0, 1.0, -1.0)
                nx_, ny_, nz_ = nx_ * flip, ny_ * flip, nz_ * flip

                u1 = draw(2 + 2 * bounce)
                u2 = draw(3 + 2 * bounce)
                use_a = jnp.abs(nx_) > jnp.abs(nz_)
                o1x = jnp.where(use_a, -ny_, 0.0)
                o1y = jnp.where(use_a, nx_, -nz_)
                o1z = jnp.where(use_a, 0.0, ny_)
                o1_inv = jax.lax.rsqrt(_dot3(o1x, o1y, o1z, o1x, o1y, o1z) + 1e-20)
                o1x, o1y, o1z = o1x * o1_inv, o1y * o1_inv, o1z * o1_inv
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

        # -- in-register reverse sweep, cotangent-free -----------------------
        h_r = zeros
        h_g = zeros
        h_b = zeros
        for bounce in range(max_bounces - 1, -1, -1):
            hit_now, s_idx, (m_r, m_g, m_b), (e_r, e_g, e_b), (c_r, c_g, c_b), cm = tape[
                bounce
            ]
            hit_f = hit_now.astype(jnp.float32)
            if cm is not None:
                ae_base = (hit_f * m_r * cm[0], hit_f * m_g * cm[1], hit_f * m_b * cm[2])
            else:
                ae_base = (hit_f * m_r, hit_f * m_g, hit_f * m_b)
            ac_base = (hit_f * m_r * h_r, hit_f * m_g * h_g, hit_f * m_b * h_b)
            for i in range(num_spheres):
                sel = jnp.where(hit_now & (s_idx == i), 1.0, 0.0)
                acc[i * 6 + 0] += sel * ae_base[0]
                acc[i * 6 + 1] += sel * ae_base[1]
                acc[i * 6 + 2] += sel * ae_base[2]
                acc[i * 6 + 3] += sel * ac_base[0]
                acc[i * 6 + 4] += sel * ac_base[1]
                acc[i * 6 + 5] += sel * ac_base[2]
            # h_n = hit ? clamp'_n*e_n + c_n*h_{n+1} : h_{n+1}
            if cm is not None:
                h_r = jnp.where(hit_now, cm[0] * e_r + c_r * h_r, h_r)
                h_g = jnp.where(hit_now, cm[1] * e_g + c_g * h_g, h_g)
                h_b = jnp.where(hit_now, cm[2] * e_b + c_b * h_b, h_b)
            else:
                h_r = jnp.where(hit_now, e_r + c_r * h_r, h_r)
                h_g = jnp.where(hit_now, e_g + c_g * h_g, h_g)
                h_b = jnp.where(hit_now, e_b + c_b * h_b, h_b)

        acc[num_spheres * 6 + 0] += col_r
        acc[num_spheres * 6 + 1] += col_g
        acc[num_spheres * 6 + 2] += col_b
        return tuple(acc)

    init = (zeros,) * (num_spheres * 6 + 3)
    acc_tiles = jax.lax.fori_loop(0, spp, sample_body, init, unroll=False)

    inv_spp = 1.0 / spp
    mean_r = acc_tiles[num_spheres * 6 + 0] * inv_spp
    mean_g = acc_tiles[num_spheres * 6 + 1] * inv_spp
    mean_b = acc_tiles[num_spheres * 6 + 2] * inv_spp
    color_ref[0] = mean_r
    color_ref[1] = mean_g
    color_ref[2] = mean_b

    if mode == "dump":
        for k in range(num_spheres * 6):
            acc_ref[k] = acc_tiles[k] * inv_spp
        return

    # Pixel cotangent of L = sum((mean - target)^2) / denom, with the
    # 1/denom applied OUTSIDE the kernel (caller folds it); per-sample
    # weight carries the spp average.
    res_r = jnp.where(in_image, mean_r - target_ref[0], 0.0)
    res_g = jnp.where(in_image, mean_g - target_ref[1], 0.0)
    res_b = jnp.where(in_image, mean_b - target_ref[2], 0.0)
    loss_part = jnp.sum(res_r * res_r + res_g * res_g + res_b * res_b)
    g_r = 2.0 * res_r * inv_spp
    g_g = 2.0 * res_g * inv_spp
    g_b = 2.0 * res_b * inv_spp

    acc = []
    for i in range(num_spheres):
        acc.append(jnp.sum(g_r * acc_tiles[i * 6 + 0]))
        acc.append(jnp.sum(g_g * acc_tiles[i * 6 + 1]))
        acc.append(jnp.sum(g_b * acc_tiles[i * 6 + 2]))
        acc.append(jnp.sum(g_r * acc_tiles[i * 6 + 3]))
        acc.append(jnp.sum(g_g * acc_tiles[i * 6 + 4]))
        acc.append(jnp.sum(g_b * acc_tiles[i * 6 + 5]))

    @pl.when(first)
    def _():
        grad_ref[...] = jnp.zeros((GRAD_ROWS, GRAD_COLS), jnp.float32)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (GRAD_ROWS, GRAD_COLS), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (GRAD_ROWS, GRAD_COLS), 1)
    update = jnp.zeros((GRAD_ROWS, GRAD_COLS), jnp.float32)
    for i in range(num_spheres):
        for ch in range(6):
            update = update + jnp.where(
                (row_ids == i) & (col_ids == ch), acc[i * 6 + ch], 0.0
            )
    # Loss partial rides in the row just past the spheres.
    update = update + jnp.where(
        (row_ids == num_spheres) & (col_ids == 0), loss_part, 0.0
    )
    grad_ref[...] += update


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def fused_loss_grads_pallas(
    scene, cam, cfg: RenderConfig, frame, target, interpret: bool = False
):
    """(loss, d_emission [N,3], d_color [N,3], color [H,W,3]) of the
    mean-squared pixel loss vs ``target``. For the diffuse gathering path:
    ONE kernel, ONE trajectory pass (see _fused_loss_grad_kernel);
    NEE/glossy configs dispatch to the in-kernel-AD backward
    (ops/pallas_ad.py — forward + AD replay, still all-Pallas)."""
    if cfg.nee or cfg.brdf != "diffuse":
        from pathtrace_tpu.ops.pallas_ad import ad_aov_grads_pallas
        from pathtrace_tpu.ops.pallas_trace import render_color_sums_pallas

        color = (
            render_color_sums_pallas(scene, cam, cfg, frame, interpret=interpret)
            / cfg.spp
        )
        diff = color - target
        denom = cfg.height * cfg.width * 3
        loss = jnp.sum(diff * diff) / denom
        d_scene, _d_cam = ad_aov_grads_pallas(
            scene, cam, cfg, frame, ct_color=2.0 * diff / denom, interpret=interpret
        )
        return loss, d_scene.emission, d_scene.color, color
    tile_h, tile_w = cfg.tile_shape
    tile_h = max(8, tile_h)
    tile_w = max(128, _round_up(min(tile_w, cfg.width), 128))
    pad_h = _round_up(cfg.height, tile_h)
    pad_w = _round_up(cfg.width, tile_w)

    scene_params = _pack_scene(scene)
    basis = cam.eye_ray_basis(cfg.width, cfg.height)
    cam_params = jnp.concatenate([cam.position[None, :], basis], axis=0)
    seed_arr = make_seed_array(cfg, frame)
    tgt = jnp.moveaxis(target, -1, 0)  # [3, H, W]
    tgt = jnp.pad(tgt, ((0, 0), (0, pad_h - cfg.height), (0, pad_w - cfg.width)))

    grid = (pad_h // tile_h, pad_w // tile_w)
    kernel = functools.partial(
        _fused_loss_grad_kernel,
        num_spheres=scene.num_objects,
        spp=cfg.spp,
        max_bounces=cfg.max_bounces,
        jitter=cfg.resolved_jitter,
        push=cfg.push_ray_origin,
        tile_h=tile_h,
        tile_w=tile_w,
        height=cfg.height,
        width=cfg.width,
    )
    grad_block, color = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (3, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (GRAD_ROWS, GRAD_COLS), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((GRAD_ROWS, GRAD_COLS), jnp.float32),
            jax.ShapeDtypeStruct((3, pad_h, pad_w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret_param(interpret),
    )(scene_params, cam_params, seed_arr, tgt)
    n = scene.num_objects
    denom = cfg.height * cfg.width * 3
    loss = grad_block[n, 0] / denom
    d_e = grad_block[:n, 0:3] / denom
    d_c = grad_block[:n, 3:6] / denom
    color = jnp.moveaxis(color[:, : cfg.height, : cfg.width], 0, -1)
    return loss, d_e, d_c, color


def grad_acc_slab(
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
    """Slab/sample-range variant of ``render_grad_acc_pallas`` — the
    shard_map hook: ONE dump-mode trajectory pass on this device's
    (row-slab, spp-range) shard -> (color [local_h, W, 3] local-spp mean,
    acc [local_h, W, 6N] local-spp-averaged cotangent-free gradient
    accumulators). Offsets may be traced mesh ``axis_index`` values.
    Diffuse gathering only (see render_grad_acc_pallas)."""
    if cfg.nee or cfg.brdf != "diffuse":
        raise ValueError("grad_acc_slab is diffuse-gathering only")
    local_h = cfg.height if local_h is None else local_h
    spp = cfg.spp if spp is None else spp
    tile_h, tile_w, pad_h, pad_w = tile_dims_grad(cfg, local_h)
    scene_params = _pack_scene(scene)
    basis = cam.eye_ray_basis(cfg.width, cfg.height)
    cam_params = jnp.concatenate([cam.position[None, :], basis], axis=0)
    seed_arr = make_seed_array(cfg, frame, sample_offset, row_offset)
    n6 = scene.num_objects * 6
    grid = (pad_h // tile_h, pad_w // tile_w)
    kernel = functools.partial(
        _fused_loss_grad_kernel,
        mode="dump",
        num_spheres=scene.num_objects,
        spp=spp,
        max_bounces=cfg.max_bounces,
        jitter=cfg.resolved_jitter,
        push=cfg.push_ray_origin,
        tile_h=tile_h,
        tile_w=tile_w,
        height=cfg.height,
        width=cfg.width,
    )
    acc, color = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (n6, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n6, pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((3, pad_h, pad_w), jnp.float32),
        ],
        interpret=interpret_param(interpret),
    )(scene_params, cam_params, seed_arr)
    color = jnp.moveaxis(color[:, :local_h, : cfg.width], 0, -1)
    acc = jnp.moveaxis(acc[:, :local_h, : cfg.width], 0, -1)
    return color, acc


def tile_dims_grad(cfg: RenderConfig, local_h: int):
    """The grad kernels' tile policy (shared by the full-frame wrappers)."""
    tile_h, tile_w = cfg.tile_shape
    tile_h = max(8, tile_h)
    tile_w = max(128, _round_up(min(tile_w, cfg.width), 128))
    return tile_h, tile_w, _round_up(local_h, tile_h), _round_up(cfg.width, tile_w)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def render_grad_acc_pallas(scene, cam, cfg: RenderConfig, frame, interpret: bool = False):
    """ONE trajectory pass -> (color [H,W,3], acc [H,W,6N]).

    ``acc[..., i*6+ch]`` is d(mean color_ch)/d{emission,albedo}_{i,ch%3}
    restricted to this pixel (cotangent-free, spp-averaged): contracting
    ``sum(ct[..., ch%3] * acc[..., i*6+ch])`` over pixels yields the exact
    gradient of ``sum(ct * mean_color)`` for ANY per-pixel cotangent ct —
    see _fused_loss_grad_kernel mode="dump".

    Diffuse gathering only BY DESIGN: the per-pixel accumulator trick
    relies on the gradient being a 6N-channel linear functional of the
    cotangent; NEE/glossy callers (pallas_cross_grads) replay through the
    in-kernel-AD backward instead."""
    if cfg.nee or cfg.brdf != "diffuse":
        raise ValueError(
            "render_grad_acc_pallas is the diffuse-gathering accumulator "
            "dump; NEE/glossy cross-estimator steps use the AD replay path"
        )
    tile_h, tile_w = cfg.tile_shape
    tile_h = max(8, tile_h)
    tile_w = max(128, _round_up(min(tile_w, cfg.width), 128))
    pad_h = _round_up(cfg.height, tile_h)
    pad_w = _round_up(cfg.width, tile_w)

    scene_params = _pack_scene(scene)
    basis = cam.eye_ray_basis(cfg.width, cfg.height)
    cam_params = jnp.concatenate([cam.position[None, :], basis], axis=0)
    seed_arr = make_seed_array(cfg, frame)
    n6 = scene.num_objects * 6
    grid = (pad_h // tile_h, pad_w // tile_w)
    kernel = functools.partial(
        _fused_loss_grad_kernel,
        mode="dump",
        num_spheres=scene.num_objects,
        spp=cfg.spp,
        max_bounces=cfg.max_bounces,
        jitter=cfg.resolved_jitter,
        push=cfg.push_ray_origin,
        tile_h=tile_h,
        tile_w=tile_w,
        height=cfg.height,
        width=cfg.width,
    )
    acc, color = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (n6, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n6, pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((3, pad_h, pad_w), jnp.float32),
        ],
        interpret=interpret_param(interpret),
    )(scene_params, cam_params, seed_arr)
    color = jnp.moveaxis(color[:, : cfg.height, : cfg.width], 0, -1)
    acc = jnp.moveaxis(acc[:, : cfg.height, : cfg.width], 0, -1)
    return color, acc


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def render_color_grads_pallas(
    scene, cam, cfg: RenderConfig, frame, cotangent, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(d_emission [N, 3], d_color [N, 3]) of L = sum(cotangent * color_mean).

    cotangent: [H, W, 3] pixel cotangents (w.r.t. the spp-averaged color).
    NEE/glossy configs dispatch to the in-kernel-AD replay (pallas_ad.py),
    which also carries geometry/camera gradients — here only the
    emission/albedo components are returned for signature parity.
    """
    if cfg.nee or cfg.brdf != "diffuse":
        from pathtrace_tpu.ops.pallas_ad import ad_aov_grads_pallas

        d_scene, _ = ad_aov_grads_pallas(
            scene, cam, cfg, frame, ct_color=cotangent, interpret=interpret
        )
        return d_scene.emission, d_scene.color
    tile_h, tile_w = cfg.tile_shape
    tile_h = max(8, tile_h)
    tile_w = max(128, _round_up(min(tile_w, cfg.width), 128))
    pad_h = _round_up(cfg.height, tile_h)
    pad_w = _round_up(cfg.width, tile_w)

    scene_params = _pack_scene(scene)
    basis = cam.eye_ray_basis(cfg.width, cfg.height)
    cam_params = jnp.concatenate([cam.position[None, :], basis], axis=0)
    seed_arr = make_seed_array(cfg, frame)
    # Fold the spp average into the cotangent; pad to the tile grid.
    ct = jnp.moveaxis(cotangent, -1, 0) / cfg.spp  # [3, H, W]
    ct = jnp.pad(ct, ((0, 0), (0, pad_h - cfg.height), (0, pad_w - cfg.width)))

    grid = (pad_h // tile_h, pad_w // tile_w)
    kernel = functools.partial(
        _color_grad_kernel,
        num_spheres=scene.num_objects,
        spp=cfg.spp,
        max_bounces=cfg.max_bounces,
        jitter=cfg.resolved_jitter,
        push=cfg.push_ray_origin,
        tile_h=tile_h,
        tile_w=tile_w,
        height=cfg.height,
        width=cfg.width,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (3, tile_h, tile_w),
                lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (GRAD_ROWS, GRAD_COLS),
            lambda i, j: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((GRAD_ROWS, GRAD_COLS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret_param(interpret),
    )(scene_params, cam_params, seed_arr, ct)
    n = scene.num_objects
    return out[:n, 0:3], out[:n, 3:6]


def pallas_cross_grads(scene, cam, cfg: RenderConfig, step, target, interpret: bool = False):
    """(loss, {d_color?, d_emission?}) of the unbiased cross-estimator
    ``mean((A - T) * (B - T))`` over two independent Pallas renders — the
    all-Pallas inverse-rendering step (see inverse.py for why plain L2 on
    one noisy render is biased).

    d/dp = mean(dA/dp * (B - T)) + mean((A - T) * dB/dp). Diffuse gathering:
    TWO trajectory passes total — each render is ONE mode="dump" kernel
    producing its color and cotangent-free per-pixel gradient accumulators;
    the cross cotangents (each side needs the OTHER side's residual,
    unknowable until both have rendered) are contracted in a cheap jnp
    epilogue. NEE/glossy: forward megakernel for each side + an in-kernel-AD
    replay against the cross cotangents (four passes; grads gain
    position/radius and are returned in the dict too).
    """
    frame_a = 2 * step
    frame_b = 2 * step + 1
    denom = cfg.height * cfg.width * 3

    if cfg.nee or cfg.brdf != "diffuse":
        from pathtrace_tpu.ops.pallas_ad import ad_aov_grads_pallas
        from pathtrace_tpu.ops.pallas_trace import render_color_sums_pallas

        a = render_color_sums_pallas(scene, cam, cfg, frame_a, interpret=interpret) / cfg.spp
        b = render_color_sums_pallas(scene, cam, cfg, frame_b, interpret=interpret) / cfg.spp
        ra, rb = a - target, b - target
        loss = jnp.sum(ra * rb) / denom
        ds_a, _ = ad_aov_grads_pallas(
            scene, cam, cfg, frame_a, ct_color=rb / denom, interpret=interpret
        )
        ds_b, _ = ad_aov_grads_pallas(
            scene, cam, cfg, frame_b, ct_color=ra / denom, interpret=interpret
        )
        return loss, {
            "emission": ds_a.emission + ds_b.emission,
            "color": ds_a.color + ds_b.color,
            "position": ds_a.position + ds_b.position,
            "radius": ds_a.radius + ds_b.radius,
        }

    a, acc_a = render_grad_acc_pallas(scene, cam, cfg, frame_a, interpret)
    b, acc_b = render_grad_acc_pallas(scene, cam, cfg, frame_b, interpret)
    ra = a - target
    rb = b - target
    loss = jnp.sum(ra * rb) / denom

    n = scene.num_objects

    def contract(ct, acc):
        # ct [H,W,3] x acc [H,W,6N] -> (d_emission [N,3], d_color [N,3])
        ct6 = jnp.tile(ct, (1, 1, 2 * n))  # rgb pattern matches acc channels
        g = jnp.sum(ct6 * acc, axis=(0, 1)).reshape(n, 6)
        return g[:, 0:3], g[:, 3:6]

    d_ea, d_ca = contract(rb / denom, acc_a)
    d_eb, d_cb = contract(ra / denom, acc_b)
    return loss, {"emission": d_ea + d_eb, "color": d_ca + d_cb}


def pallas_loss_and_grads(scene, cam, cfg: RenderConfig, frame, target, interpret: bool = False):
    """(loss, (d_scene, d_camera)) of the mean-squared pixel loss — the
    all-Pallas fwd+bwd path for EVERY config. Diffuse/no-NEE: the
    single-pass fused kernel (geometry/camera gradients are exactly zero
    for that estimator, so the zero blocks are correct, not placeholders).
    NEE diffuse: the hand-derived single-pass sweep (pallas_nee_grad.py,
    ~2x the AD kernel's throughput, full geometry + camera gradients).
    Glossy: the in-kernel-AD backward (pallas_ad.py)."""
    from pathtrace_tpu.camera import Camera
    from pathtrace_tpu.scene import Scene

    if cfg.nee and cfg.brdf == "diffuse":
        from pathtrace_tpu.ops.pallas_nee_grad import nee_loss_and_grads_pallas

        return nee_loss_and_grads_pallas(scene, cam, cfg, frame, target, interpret)
    if cfg.nee or cfg.brdf != "diffuse":
        from pathtrace_tpu.ops.pallas_ad import ad_loss_and_grads_pallas

        return ad_loss_and_grads_pallas(scene, cam, cfg, frame, target, interpret)

    loss, d_e, d_c, _color = fused_loss_grads_pallas(
        scene, cam, cfg, frame, target, interpret
    )
    d_scene = Scene(
        radius=jnp.zeros_like(scene.radius),
        position=jnp.zeros_like(scene.position),
        emission=d_e,
        color=d_c,
    )
    d_cam = Camera(
        position=jnp.zeros_like(cam.position),
        yaw=jnp.zeros_like(cam.yaw),
        pitch=jnp.zeros_like(cam.pitch),
    )
    return loss, (d_scene, d_cam)
