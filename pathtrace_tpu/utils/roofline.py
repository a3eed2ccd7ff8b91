"""Roofline / MFU accounting for the Pallas megakernel.

The bench headline (Mrays/s) is unfalsifiable without a denominator: is
6-7 Grays/s 40% of what the chip can do, or 95%? This module supplies the
two halves of that denominator (VERDICT r3 item #2):

1. **A counted op budget** for the kernel's per-(pixel, sample) work —
   derived from the *actual traced op sequence*, not an estimate: the
   per-sample body of ``_pathtrace_kernel`` (ops/pallas_trace.py) is
   re-traced here with ``jax.make_jaxpr`` and the jaxpr is walked,
   weighting every primitive by its output element count. Float
   arithmetic, integer/bool ops (the counter-based RNG is pure int32) and
   transcendentals (sqrt/rsqrt/sin/cos) are tallied separately, because
   they retire at different VPU rates.

2. **A measured VPU peak** on the same chip: a Pallas microbenchmark that
   retires a long chain of independent elementwise FMAs (and a mul-only
   chain) from VMEM — the empirical speed of light for exactly the kind
   of code the megakernel is (the published TPU peak-FLOP numbers are MXU
   matmul numbers; a path tracer never touches the MXU, so quoting them
   would overstate the roofline by ~an order of magnitude).

MFU here = achieved f32 FLOP/s (counted muls/adds, 1 each) divided by the
measured FMA peak (2 FLOPs per retired FMA lane-op). It is conservative:
int/bool lattice work (~30% of the kernel's issue slots) earns no credit
in the numerator. ``vpu_issue_util`` counts EVERY op (float+int+bool+
transcendental) against the measured mul-only issue rate — an upper-bound
utilization where FMA fusion can push it past 1.0. The truth is between;
docs/ROOFLINE.md reports both.

The reference has no analog — it never measures utilization at all
(``include/Renderer.h:63-75`` records ms and stops there).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from pathtrace_tpu.config import RenderConfig

# Primitive classification. Anything not listed and not shape-only counts
# as one op per output element (conservative default).
_TRANSCENDENTAL = {
    "sqrt", "rsqrt", "sin", "cos", "tan", "exp", "log", "log1p", "expm1",
    "atan2", "tanh", "logistic", "erf", "cbrt", "pow",
}
_SHAPE_ONLY = {
    "broadcast_in_dim", "reshape", "squeeze", "transpose", "slice",
    "dynamic_slice", "dynamic_update_slice", "concatenate", "rev",
    "stop_gradient", "copy", "convert_element_type", "bitcast_convert_type",
    "iota", "gather", "scatter", "pad",
}
_TWO_OPS = {"clamp"}  # max(lo, min(x, hi))
_CALL_PARAMS = ("jaxpr", "call_jaxpr", "fun_jaxpr")


def _aval_elems(aval) -> int:
    n = 1
    for d in getattr(aval, "shape", ()):  # scalar -> 1
        n *= int(d)
    return n


def count_jaxpr_ops(jaxpr) -> Dict[str, float]:
    """Walk a (closed) jaxpr, tallying per-element op counts by class:
    ``flops`` (f32 arithmetic, mul/add = 1 each), ``int_ops`` (integer and
    bool lattice ops — the RNG), ``transcendentals``. Recurses into inner
    jaxprs (pjit, custom_jvp/vjp, scan x length, cond max-branch)."""
    counts = {"flops": 0.0, "int_ops": 0.0, "transcendentals": 0.0}
    inner = getattr(jaxpr, "jaxpr", jaxpr)
    for eqn in inner.eqns:
        name = eqn.primitive.name
        sub = None
        for key in _CALL_PARAMS:
            if key in eqn.params:
                sub = eqn.params[key]
                break
        if sub is not None:
            mult = 1
            if name == "scan":
                mult = int(eqn.params.get("length", 1))
            c = count_jaxpr_ops(sub)
            for k in counts:
                counts[k] += mult * c[k]
            continue
        if name == "cond":
            branch_counts = [count_jaxpr_ops(b) for b in eqn.params["branches"]]
            for k in counts:
                counts[k] += max(b[k] for b in branch_counts)
            continue
        if name == "while":
            # Not used by the kernel mirrors; count one body trip.
            c = count_jaxpr_ops(eqn.params["body_jaxpr"])
            for k in counts:
                counts[k] += c[k]
            continue
        if name in _SHAPE_ONLY:
            continue
        if name.startswith("reduce_"):
            # A reduction retires ~one op per INPUT element.
            elems = sum(_aval_elems(v.aval) for v in eqn.invars)
        else:
            elems = max(_aval_elems(v.aval) for v in eqn.outvars)
        weight = 2 if name in _TWO_OPS else 1
        if name in _TRANSCENDENTAL:
            counts["transcendentals"] += elems * weight
        else:
            dt = eqn.outvars[0].aval.dtype
            is_float = jnp.issubdtype(dt, jnp.floating)
            if not is_float and eqn.invars:
                in_dt = eqn.invars[0].aval.dtype
                is_float = jnp.issubdtype(in_dt, jnp.floating)
            counts["flops" if is_float else "int_ops"] += elems * weight
        continue
    return counts


def _kernel_sample_mirror(cfg: RenderConfig, num_spheres: int, shape=(8, 128),
                          sample_index: int = 7, frame: int = 1):
    """A traceable mirror of ONE iteration of the megakernel's per-sample
    body (``_pathtrace_kernel.sample_body``: the draw chain +
    ``trace_tile_sample`` + channel sums + the 4 Welford updates), used
    to COUNT its ops. Mirrors, not calls, the kernel — the kernel body
    needs Refs; the math below is the same functions it calls.

    ``sample_index``/``frame`` parameterize the RNG lattice position so
    tests can ACCUMULATE the mirror over s=0..spp-1 and assert bitwise
    equality with the real kernel's render on an (8,128) tile — the check
    that this hand-maintained duplicate cannot silently drift from
    ``_pathtrace_kernel`` (tests/test_render.py::test_roofline_mirror_
    matches_kernel, advisor r4)."""
    from pathtrace_tpu.ops.pallas_trace import (
        LUMA_B, LUMA_G, LUMA_R, _mix32, _P_FRAME, _P_GOLD, _P_ROW,
        _uniform_01, trace_tile_sample,
    )

    spb = 5 if cfg.brdf == "glossy" else 2
    n_slots = 2 + spb * cfg.max_bounces

    def fn(scene10, cam53, carry):
        sc = tuple(
            tuple(scene10[i, j] for j in range(10)) for i in range(num_spheres)
        )
        eye = (cam53[0, 0], cam53[0, 1], cam53[0, 2])
        basis = tuple(
            (cam53[k, 0], cam53[k, 1], cam53[k, 2]) for k in range(1, 5)
        )
        rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        pix_key = _mix32(rows_i * jnp.int32(_P_GOLD) ^ (cols_i * jnp.int32(_P_ROW)))
        base_key = _mix32(
            jnp.int32(cfg.seed) ^ _mix32(jnp.int32(frame) * jnp.int32(_P_FRAME))
        )

        def draw(slot):
            dk = _mix32(base_key ^ (
                (jnp.int32(sample_index) * n_slots + jnp.int32(slot))
                * jnp.int32(_P_GOLD)
            ))
            return _uniform_01(pix_key, dk)

        (
            col_r, col_g, col_b, fn_x, fn_y, fn_z,
            fa_r, fa_g, fa_b, f_d, hit0, active,
        ) = trace_tile_sample(
            sc, eye, basis,
            rows_i.astype(jnp.float32), cols_i.astype(jnp.float32), draw,
            num_spheres=num_spheres,
            max_bounces=cfg.max_bounces,
            jitter=cfg.resolved_jitter,
            push=cfg.push_ray_origin,
            height=cfg.height,
            width=cfg.width,
            nee_light_index=cfg.light_index if cfg.nee else None,
            brdf=cfg.brdf,
        )
        sums = [carry[k] + v for k, v in enumerate(
            (col_r, col_g, col_b, fn_x, fn_y, fn_z, fa_r, fa_g, fa_b, f_d)
        )]

        def welford(n, mean, m2, x, include):
            inc = include.astype(jnp.float32)
            n_new = n + inc
            delta = x - mean
            mean_new = mean + jnp.where(
                n_new > 0.0, inc * delta / jnp.maximum(n_new, 1.0), 0.0
            )
            delta2 = x - mean_new
            m2_new = m2 + inc * delta * delta2
            return [n_new, mean_new, m2_new]

        lum_c = LUMA_R * col_r + LUMA_G * col_g + LUMA_B * col_b
        lum_n = LUMA_R * fn_x + LUMA_G * fn_y + LUMA_B * fn_z
        lum_a = LUMA_R * fa_r + LUMA_G * fa_g + LUMA_B * fa_b
        out = sums
        out += welford(carry[10], carry[11], carry[12], lum_c, active)
        out += welford(carry[13], carry[14], carry[15], lum_n, hit0)
        out += welford(carry[16], carry[17], carry[18], lum_a, hit0)
        out += welford(carry[19], carry[20], carry[21], f_d, hit0)
        return tuple(out)

    return fn


def _count_cfg(cfg: RenderConfig) -> RenderConfig:
    """Normalize a config to the fields the per-sample op COUNT actually
    depends on (brdf, nee/light_index, max_bounces, resolved jitter,
    num_spheres). Without this every new width/height/spp/seed re-traces
    the whole 5-bounce sample body and thrashes the lru cache (advisor
    r4). spp is pinned to 1 or 2 to preserve ``resolved_jitter``."""
    import dataclasses

    return dataclasses.replace(
        cfg, width=128, height=128, spp=1 if not cfg.resolved_jitter else 2,
        jitter=cfg.resolved_jitter, seed=0, spp_chunk=0,
        tile_shape=(8, 128),
    )


def megakernel_ops(cfg: RenderConfig, num_spheres: int = 9) -> Dict[str, float]:
    return _megakernel_ops_impl(_count_cfg(cfg), num_spheres)


@functools.lru_cache(maxsize=16)
def _megakernel_ops_impl(cfg: RenderConfig, num_spheres: int = 9) -> Dict[str, float]:
    """Counted ops per (pixel, sample) of the megakernel's sample body,
    split by class, plus the per-SEGMENT (per path-bounce, the Mrays unit)
    totals the roofline uses."""
    shape = (8, 128)
    fn = _kernel_sample_mirror(cfg, num_spheres, shape)
    scene10 = jnp.zeros((num_spheres, 10), jnp.float32)
    cam53 = jnp.zeros((5, 3), jnp.float32)
    carry = tuple(jnp.zeros(shape, jnp.float32) for _ in range(22))
    jaxpr = jax.make_jaxpr(fn)(scene10, cam53, carry)
    counts = count_jaxpr_ops(jaxpr)
    elems = shape[0] * shape[1]
    per_px_sample = {k: v / elems for k, v in counts.items()}
    per_px_sample["total"] = sum(per_px_sample.values())
    per_seg = {k: v / cfg.max_bounces for k, v in per_px_sample.items()}
    return {"per_pixel_sample": per_px_sample, "per_segment": per_seg}


def ad_kernel_ops(cfg: RenderConfig, num_spheres: int = 9) -> Dict[str, float]:
    return _ad_kernel_ops_impl(_count_cfg(cfg), num_spheres)


@functools.lru_cache(maxsize=16)
def _ad_kernel_ops_impl(cfg: RenderConfig, num_spheres: int = 9) -> Dict[str, float]:
    """Counted ops per (pixel, sample) of the in-kernel-AD gradient
    kernel's sample body (ops/pallas_ad.py: jax.vjp of the trace with
    tile-shaped parameters + Kahan accumulation), and of the color-only
    forward pass that feeds it — the two components of
    ``ad_loss_and_grads_pallas``. Keys: ``vjp_per_pixel_sample``,
    ``vjp_per_segment``, ``fwd_color_per_segment``."""
    from pathtrace_tpu.ops.pallas_trace import trace_tile_sample

    shape = (8, 128)
    mirror = _kernel_sample_mirror(cfg, num_spheres, shape)  # for the draw chain

    def trace_args():
        rows = jnp.zeros(shape, jnp.float32)
        cols = jnp.zeros(shape, jnp.float32)

        def draw(slot):
            return jnp.full(shape, 0.5, jnp.float32)

        kwargs = dict(
            num_spheres=num_spheres,
            max_bounces=cfg.max_bounces,
            jitter=cfg.resolved_jitter,
            push=cfg.push_ray_origin,
            height=cfg.height,
            width=cfg.width,
            nee_light_index=cfg.light_index if cfg.nee else None,
            brdf=cfg.brdf,
        )
        return rows, cols, draw, kwargs

    del mirror  # draw-chain RNG cost is counted inside megakernel_ops

    rows, cols, draw, kwargs = trace_args()
    ct = tuple(jnp.zeros(shape, jnp.float32) for _ in range(10))
    tile0 = jnp.zeros(shape, jnp.float32)

    def vjp_body(sc_t, eye_t, basis_t, carry):
        def f(sc_, eye_, basis_):
            out = trace_tile_sample(sc_, eye_, basis_, rows, cols, draw, **kwargs)
            return sum(ct[k] * out[k] for k in range(10))

        _, vjp_fn = jax.vjp(f, sc_t, eye_t, basis_t)
        flat = jax.tree_util.tree_leaves(vjp_fn(jnp.ones(shape, jnp.float32)))
        sums, comps = carry
        new_sums, new_comps = [], []
        for s_, c_, g in zip(sums, comps, flat):
            y = g - c_
            t = s_ + y
            new_comps.append((t - s_) - y)
            new_sums.append(t)
        return tuple(new_sums), tuple(new_comps)

    n_par = num_spheres * 10 + 15
    sc_t = tuple(tuple(tile0 for _ in range(10)) for _ in range(num_spheres))
    eye_t = (tile0,) * 3
    basis_t = tuple((tile0,) * 3 for _ in range(4))
    zp = (tile0,) * n_par
    vjp_counts = count_jaxpr_ops(
        jax.make_jaxpr(vjp_body)(sc_t, eye_t, basis_t, (zp, zp))
    )

    def fwd_color(sc_t, eye_t, basis_t, carry):
        out = trace_tile_sample(sc_t, eye_t, basis_t, rows, cols, draw, **kwargs)
        return carry[0] + out[0], carry[1] + out[1], carry[2] + out[2]

    fwd_counts = count_jaxpr_ops(
        jax.make_jaxpr(fwd_color)(sc_t, eye_t, basis_t, (tile0,) * 3)
    )
    elems = shape[0] * shape[1]
    vjp_px = {k: v / elems for k, v in vjp_counts.items()}
    vjp_px["total"] = sum(vjp_px.values())
    fwd_px = {k: v / elems for k, v in fwd_counts.items()}
    fwd_px["total"] = sum(fwd_px.values())
    return {
        "vjp_per_pixel_sample": vjp_px,
        "vjp_per_segment": {k: v / cfg.max_bounces for k, v in vjp_px.items()},
        "fwd_color_per_segment": {k: v / cfg.max_bounces for k, v in fwd_px.items()},
    }


def _find_pallas_call(jaxpr):
    inner = getattr(jaxpr, "jaxpr", jaxpr)
    for eqn in inner.eqns:
        if eqn.primitive.name == "pallas_call":
            return eqn
        for key in _CALL_PARAMS:
            if key in eqn.params:
                found = _find_pallas_call(eqn.params[key])
                if found is not None:
                    return found
    return None


def nee_kernel_ops(num_spheres: int = 9, max_bounces: int = 5) -> Dict[str, float]:
    """Counted per-(sample, segment) op budget of the hand-derived NEE
    fused fwd+bwd kernel (ops/pallas_nee_grad.py) — counted from the REAL
    kernel jaxpr (the ``pallas_call`` primitive's inner jaxpr), not a
    mirror: two traces at spp 2 and 4 difference away the per-tile
    epilogue (cotangent contraction + reductions), leaving exactly the
    per-sample spp-loop body."""
    import jax.numpy as jnp

    from pathtrace_tpu.camera import Camera
    from pathtrace_tpu.ops.pallas_nee_grad import nee_loss_and_grads_pallas
    from pathtrace_tpu.scene import cornell_box

    scene, cam = cornell_box(), Camera.create()
    assert scene.num_objects == num_spheres

    def tile_counts(spp):
        cfg = RenderConfig(
            width=128, height=8, spp=spp, max_bounces=max_bounces,
            backend="pallas", nee=True, tile_shape=(8, 128),
        )
        target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
        jx = jax.make_jaxpr(
            lambda s, c, t: nee_loss_and_grads_pallas(s, c, cfg, 0, t)
        )(scene, cam, target)
        eqn = _find_pallas_call(jx)
        counts = count_jaxpr_ops(eqn.params["jaxpr"])
        return {k: v / (8 * 128) for k, v in counts.items()}

    lo, hi = tile_counts(2), tile_counts(4)
    per_seg = {
        k: (hi[k] - lo[k]) / 2.0 / max_bounces for k in lo
    }
    per_seg["total"] = sum(per_seg.values())
    epilogue_per_px = {k: lo[k] - 2.0 * max_bounces * per_seg[k] for k in lo}
    return {"per_segment": per_seg, "epilogue_per_pixel": epilogue_per_px}


# -- measured VPU peak -------------------------------------------------------

def _chain_kernel(x_ref, a_ref, o_ref, *, iters: int, inner: int,
                  chains: int, fma: bool):
    # Three failure modes this shape defends against (all observed):
    # a 1-op loop body measures VMEM streaming, not the ALUs (0.27
    # "TFLOP/s"); chained COMPILE-TIME-constant FMAs are affine chains the
    # compiler composes into one op (2104 "TFLOP/s"); and a single
    # dependent chain is FMA-LATENCY-bound, not issue-bound (2.8 TFLOP/s —
    # below what the megakernel itself achieves). So: ``chains``
    # INDEPENDENT register-resident chains per element, ``inner`` chained
    # ops each per trip, RUNTIME per-element coefficients.
    x = x_ref[...]
    a = a_ref[...]
    b = x * jnp.float32(1e-7)
    init = tuple(x * (1.0 + 0.001 * c) for c in range(chains))

    def body(_, xs):
        outs = []
        for x_c in xs:
            for _k in range(inner):
                x_c = x_c * a + b if fma else x_c * a
            outs.append(x_c)
        return tuple(outs)

    final = jax.lax.fori_loop(0, iters, body, init)
    acc = final[0]
    for x_c in final[1:]:
        acc = acc + x_c
    o_ref[...] = acc


def measure_vpu_peak(iters: int = 256, inner: int = 32, block=(64, 128),
                     grid: int = 2048, chains: int = 8, reps: int = 3
                     ) -> Dict[str, float]:
    """Empirical VPU speed of light on THIS chip: FLOP/s of pure
    elementwise FMA chains (2 FLOPs per element-op) and mul-only chains
    (1 FLOP per element-op = the issue rate). The block stays in vector
    registers and ``chains`` independent chains provide the ILP to hide
    FMA latency. Returns {"peak_fma_flops", "peak_mul_flops"}."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.ones((grid * block[0], block[1]), jnp.float32)
    a = jnp.full(x.shape, 0.9999999, jnp.float32)
    out = {}
    for fma in (True, False):
        call = pl.pallas_call(
            functools.partial(_chain_kernel, iters=iters, inner=inner,
                              chains=chains, fma=fma),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        )
        run = jax.jit(call)
        # time_fn forces a host readback: on the tunneled backend
        # block_until_ready alone returns before the device finishes
        # (utils/timing._force) — timing without it reports fantasy
        # thousands of TFLOP/s.
        from pathtrace_tpu.utils.timing import time_fn

        best = min(
            time_fn(run, x, a, warmup=1 if r == 0 else 0, iters=2)[0]
            for r in range(max(reps, 1))
        )
        elem_ops = x.size * iters * inner * chains
        flops = elem_ops * (2 if fma else 1)
        out["peak_fma_flops" if fma else "peak_mul_flops"] = flops / best
    return out


def mfu_report(cfg: RenderConfig, measured_secs_per_frame: float,
               num_spheres: int = 9, peaks: Dict[str, float] | None = None
               ) -> Dict[str, float]:
    """Assemble the roofline record for one measured forward frame."""
    ops = megakernel_ops(cfg, num_spheres)["per_pixel_sample"]
    n_px_samples = cfg.width * cfg.height * cfg.spp
    per_s = {k: v * n_px_samples / measured_secs_per_frame for k, v in ops.items()}
    if peaks is None:
        peaks = measure_vpu_peak()
    return {
        "counted_flops_per_segment": ops["flops"] / cfg.max_bounces,
        "counted_int_ops_per_segment": ops["int_ops"] / cfg.max_bounces,
        "counted_transcendentals_per_segment": ops["transcendentals"] / cfg.max_bounces,
        "achieved_flops_per_sec": per_s["flops"],
        "achieved_total_ops_per_sec": per_s["total"],
        "peak_fma_flops": peaks["peak_fma_flops"],
        "peak_mul_flops": peaks["peak_mul_flops"],
        "mfu": per_s["flops"] / peaks["peak_fma_flops"],
        "vpu_issue_util": per_s["total"] / peaks["peak_mul_flops"],
    }
