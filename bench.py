"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: forward-render throughput of the Pallas megakernel on the
BASELINE workload (Cornell box, 512x512, 32 spp, 5 bounces), in
Mrays/s/chip where rays = W*H*spp*bounces path segments. Auxiliary fields
report the sharded-runtime forward, the fused (hand-derived) and the
general (in-kernel-AD, NEE) forward+backward, the MFU/roofline numbers
(counted kernel flops vs the measured VPU peak — docs/ROOFLINE.md), the
inverse-rendering step and the interactive denoised-frame rate.
Cross-round comparison is per-field: ``vs_baseline`` is headline-fwd vs
the best prior round's headline-fwd, and ``vs_prior`` carries the same
ratio for every auxiliary metric a prior record also has.

Budget discipline (VERDICT r2 item #1): the harness must finish cold in
well under the driver budget. It therefore (a) enables the persistent
compilation cache, (b) amortizes the tunnel's fixed ~29 ms/dispatch
overhead over long fori_loop frame chains (K per metric) with <=2
repeats, (c) emits the headline JSON line AS SOON as the Pallas forward
is measured — a later timeout still records a result — and re-emits the
full line at the end (drivers that take the last JSON line get the
complete record), and (d) gates the slow jnp fwd+bwd remat program
behind --full.

Timing mechanism analog: cudaEvent elapsed-ms around the kernel launch,
reference include/Renderer.h:63-75 / src/main.cu:183.

Usage: python bench.py [--size 512] [--spp 32] [--quick] [--full]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def _prior_records() -> list[dict]:
    """All previous driver-recorded bench records (BENCH_r*.json)."""
    recs = []
    for path in glob.glob(os.path.join(os.path.dirname(__file__) or ".", "BENCH_r*.json")):
        try:
            with open(path) as f:
                rec = json.load(f)
            if "value" not in rec and isinstance(rec.get("parsed"), dict):
                rec = rec["parsed"]  # driver wraps the JSON line in "parsed"
            recs.append(rec)
        except Exception:
            pass
    return recs


def _prior_best(recs: list[dict], field: str) -> float | None:
    """Best prior value of ONE field — cross-round comparisons are always
    per-field (fwd vs fwd, fwd+bwd vs fwd+bwd; VERDICT r3 weak #2: the
    old max-over-files 'value' made vs_baseline self-referential and let
    a methodology change masquerade as speedup)."""
    best = None
    for rec in recs:
        try:
            v = float(rec.get(field, 0.0))
        except (TypeError, ValueError):
            continue
        if v > 0 and (best is None or v > best):
            best = v
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--bounces", type=int, default=5)
    ap.add_argument("--quick", action="store_true", help="128x128x4spp smoke")
    ap.add_argument("--no-grad", action="store_true", help="skip fwd+bwd timing")
    ap.add_argument(
        "--full", action="store_true",
        help="also time the slow jnp-backend forward and fwd+bwd remat programs",
    )
    args = ap.parse_args()
    if args.quick:
        args.size, args.spp = 128, 4

    import jax

    # Persistent compilation cache: a warm rerun (or a rerun after a timeout)
    # skips every XLA compile that already happened — the single largest cost
    # of a bench run over the tunneled chip (tests/conftest.py does the same).
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

    import jax.numpy as jnp

    from pathtrace_tpu import Camera, RenderConfig, cornell_box
    from pathtrace_tpu.utils.timing import mrays_per_sec, time_fn

    backend = jax.default_backend()
    # Pre-resident args: re-uploading the (tiny) scene/camera pytrees costs
    # an RPC round trip per dispatch over the tunnel — ~29 ms measured,
    # 4x the 512^2 frame itself.
    scene = jax.device_put(cornell_box())
    cam = jax.device_put(Camera.create())
    n_rays = args.size * args.size * args.spp * args.bounces
    priors = _prior_records()
    prior = _prior_best(priors, "value")
    t_start = time.time()

    # Each dispatch over the axon tunnel carries a fixed ~25-30 ms of RPC/
    # host overhead; chain K frames inside ONE jit (data-dependent
    # accumulator) so the measurement reflects device time, then divide.
    # K is per-metric: long chains for cheap frames (the 512^2 forward is
    # ~6 ms), shorter for the heavy fwd+bwd programs. fori_loop compile
    # time is K-independent.

    def per_frame_seconds(frame_scalar_fn, repeats: int = 1, k: int = 64):
        if args.quick:
            k = min(k, 8)

        @jax.jit
        def multi(scene_, cam_, frame0):
            def body(i, acc):
                return acc + frame_scalar_fn(scene_, cam_, frame0 + i)

            return jax.lax.fori_loop(0, k, body, 0.0)

        # Best-of-N: the tunneled chip is shared and a transient slowdown in
        # a single window has been observed to skew a metric by ~25%.
        secs = min(
            time_fn(multi, scene, cam, 0, warmup=1 if r == 0 else 0, iters=2)[0]
            for r in range(max(repeats, 1))
        )
        return secs / k

    def emit(headline, extras):
        # vs_baseline: headline fwd vs the best PRIOR round's headline fwd
        # (same field). vs_prior: the same per-field ratio for every other
        # metric that exists in a prior record — the record explains its
        # own history without reading bench.py's past (VERDICT r3 item #6).
        vs_prior = {}
        for field, cur in extras.items():
            # Only genuine throughput fields get a cross-round ratio:
            # time-valued fields invert the better-direction semantics, and
            # counted/peak constants (counted_flops_per_segment, mfu, ...)
            # would read as "improvements" when a kernel change merely adds
            # flops (advisor r4).
            if not field.endswith(("_mrays", "_fps")):
                continue
            pv = _prior_best(priors, field)
            if pv:
                vs_prior[field] = round(cur / pv, 3)
        result = {
            "metric": (
                f"Mrays/s/chip fwd (Cornell {args.size}^2 x {args.spp}spp"
                f" x {args.bounces} bounces)"
            ),
            "value": round(headline, 3),
            "unit": "Mrays/s",
            "vs_baseline": round(headline / prior, 3) if prior else 1.0,
            "backend": backend,
            "n_rays_per_frame": n_rays,
            "elapsed_s": round(time.time() - t_start, 1),
            **{k: (round(v, 4) if isinstance(v, float) else v) for k, v in extras.items()},
        }
        if vs_prior:
            result["vs_prior"] = vs_prior
        print(json.dumps(result), flush=True)

    extras = {}
    on_tpu = backend in ("tpu", "axon")

    # -- Pallas megakernel forward (TPU) / jnp fallback elsewhere ----------
    if on_tpu:
        from pathtrace_tpu.ops.pallas_trace import render_channels_pallas

        cfg = RenderConfig(
            width=args.size, height=args.size, spp=args.spp,
            max_bounces=args.bounces, backend="pallas",
        )
        secs = per_frame_seconds(
            lambda s, c, f: render_channels_pallas(s, c, cfg, f)[0, 0, 0],
            repeats=2, k=128,
        )
        headline = mrays_per_sec(args.size, args.size, args.spp, args.bounces, secs)
        extras["pallas_fwd_ms"] = secs * 1e3
        # Early emit: if any later stage exceeds the driver budget, this line
        # is already on the record.
        emit(headline, extras)
    else:
        headline = None

    # -- Pallas megakernel under shard_map (1-device mesh) ------------------
    # Gate: the sharded runtime must not tax the kernel — within ~10% of the
    # unsharded megakernel (met at ~1% in rounds 1-2).
    if on_tpu:
        from pathtrace_tpu.parallel import make_mesh
        from pathtrace_tpu.parallel.shard import render_channels_sharded

        mesh1 = make_mesh(tiles=1, samples=1, devices=jax.devices()[:1])
        secs_sh = per_frame_seconds(
            lambda s, c, f: render_channels_sharded(s, c, cfg, mesh1, f)[0, 0, 0],
        )
        extras["sharded_1dev_fwd_mrays"] = mrays_per_sec(
            args.size, args.size, args.spp, args.bounces, secs_sh
        )

    # -- Pallas forward+backward (emission/albedo product-chain kernel) -----
    if on_tpu and not args.no_grad:
        from pathtrace_tpu.ops.pallas_grad import pallas_loss_and_grads

        target0 = jnp.zeros((args.size, args.size, 3), jnp.float32)

        def pallas_grad_scalar(s, c, f):
            loss, (d_scene, _) = pallas_loss_and_grads(s, c, cfg, f, target0)
            return loss + jnp.sum(d_scene.emission)

        secs_pg = per_frame_seconds(pallas_grad_scalar, repeats=2)
        extras["pallas_fwd_bwd_mrays"] = mrays_per_sec(
            args.size, args.size, args.spp, args.bounces, secs_pg
        )
        emit(headline, extras)

    # -- general fwd+bwd (NEE: every parameter incl. geometry + camera) -----
    # ``ad_fwd_bwd_mrays`` is the PRODUCTION general-backward path at the
    # BASELINE config with NEE on — since r5 the hand-derived single-pass
    # sweep (ops/pallas_nee_grad.py) that pallas_loss_and_grads dispatches
    # to; ``vjp_fwd_bwd_mrays`` keeps the generic in-kernel-AD replay
    # (ops/pallas_ad.py, the r4 engine and still the glossy fallback) on
    # the record for comparison.
    if on_tpu and not args.no_grad:
        import dataclasses

        from pathtrace_tpu.ops.pallas_ad import ad_loss_and_grads_pallas

        cfg_nee = dataclasses.replace(cfg, nee=True)

        def hand_grad_scalar(s, c, f):
            loss, (d_scene, d_cam) = pallas_loss_and_grads(
                s, c, cfg_nee, f, target0
            )
            return loss + jnp.sum(d_scene.emission) + jnp.sum(d_cam.position)

        secs_hand = per_frame_seconds(hand_grad_scalar, repeats=2, k=32)
        extras["ad_fwd_bwd_mrays"] = mrays_per_sec(
            args.size, args.size, args.spp, args.bounces, secs_hand
        )
        extras["ad_backend"] = "hand_nee_sweep"
        emit(headline, extras)

        def vjp_grad_scalar(s, c, f):
            loss, (d_scene, d_cam) = ad_loss_and_grads_pallas(
                s, c, cfg_nee, f, target0
            )
            return loss + jnp.sum(d_scene.emission) + jnp.sum(d_cam.position)

        secs_ad = per_frame_seconds(vjp_grad_scalar, repeats=2, k=32)
        extras["vjp_fwd_bwd_mrays"] = mrays_per_sec(
            args.size, args.size, args.spp, args.bounces, secs_ad
        )
        emit(headline, extras)

    # -- sharded SPMD training step on the 1-device mesh --------------------
    # The step that would scale (VERDICT r4 #5): sharded_loss_grads on a
    # 1-device mesh at the BASELINE config — the sharded-runtime tax on the
    # TRAINING path, next to the forward's ~4%.
    if on_tpu and not args.no_grad:
        from pathtrace_tpu.parallel.shard import sharded_loss_grads

        def sharded_grad_scalar(s, c, f):
            loss, (d_scene, _) = sharded_loss_grads(s, c, cfg, mesh1, target0, f)
            return loss + jnp.sum(d_scene.emission)

        secs_sg = per_frame_seconds(sharded_grad_scalar, repeats=2)
        extras["sharded_1dev_fwd_bwd_mrays"] = mrays_per_sec(
            args.size, args.size, args.spp, args.bounces, secs_sg
        )
        emit(headline, extras)

    # -- MFU / roofline (docs/ROOFLINE.md has the full derivation) ----------
    # Counted kernel ops (traced from the kernel's own op sequence) over
    # the measured forward frame, against the VPU peak measured on THIS
    # chip by a Pallas FMA-chain microbenchmark (VERDICT r3 item #2).
    if on_tpu:
        from pathtrace_tpu.utils.roofline import mfu_report

        rep = mfu_report(cfg, secs)
        extras["counted_flops_per_segment"] = rep["counted_flops_per_segment"]
        extras["achieved_tflops"] = rep["achieved_flops_per_sec"] / 1e12
        extras["peak_fma_tflops"] = rep["peak_fma_flops"] / 1e12
        extras["mfu"] = rep["mfu"]
        extras["vpu_issue_util"] = rep["vpu_issue_util"]
        emit(headline, extras)

    # -- all-Pallas inverse-rendering step (cross-estimator, 256^2 x 8spp) --
    if on_tpu and not args.no_grad and not args.quick:
        from pathtrace_tpu.ops.pallas_grad import pallas_cross_grads

        cfg_inv = RenderConfig(width=256, height=256, spp=8, backend="pallas")
        target_inv = jnp.zeros((256, 256, 3), jnp.float32)

        def inv_scalar(s, c, f):
            loss, g = pallas_cross_grads(s, c, cfg_inv, f, target_inv)
            return loss + jnp.sum(g["color"]) + jnp.sum(g["emission"])

        secs_inv = per_frame_seconds(inv_scalar)
        extras["inverse_step_ms"] = secs_inv * 1e3

    # -- interactive denoised frame: 512^2 x 4spp render + CNN forward ------
    if on_tpu and not args.quick:
        from pathtrace_tpu.models.denoise_cnn import DenoiseCNN
        from pathtrace_tpu.models.infer import _denoise_jit
        from pathtrace_tpu.ops.pallas_trace import render_channels_pallas
        from pathtrace_tpu.train import create_state

        cfg_int = RenderConfig(
            width=args.size, height=args.size, spp=4, max_bounces=args.bounces,
            backend="pallas",
        )
        model = DenoiseCNN()
        state = create_state(jax.random.key(0), model, (args.size, args.size, 14))

        def frame_scalar(s, c, f):
            buf = render_channels_pallas(s, c, cfg_int, f)
            rgb = _denoise_jit(model, state.params, state.batch_stats, buf)
            return rgb[0, 0, 0]

        secs_f = per_frame_seconds(frame_scalar)
        extras["denoised_frame_ms"] = secs_f * 1e3
        extras["denoised_frame_fps"] = 1.0 / secs_f

    # -- jnp (differentiable oracle) forward / fwd+bwd: --full only ---------
    # The 512^2 x 32spp jnp fwd+bwd remat program is the slowest compile in
    # the repo (~minutes cold) and is not the headline path; it stays
    # measurable but off the default budget (VERDICT r2 weak #1).
    if args.full or not on_tpu:
        from pathtrace_tpu.render import render_channels

        spp_chunk = 8 if args.spp > 8 else 0
        cfg_jnp = RenderConfig(
            width=args.size, height=args.size, spp=args.spp,
            max_bounces=args.bounces, backend="jnp", spp_chunk=spp_chunk,
        )
        secs_jnp = per_frame_seconds(
            lambda s, c, f: render_channels(s, c, cfg_jnp, f)[0, 0, 0]
        )
        extras["jnp_fwd_mrays"] = mrays_per_sec(
            args.size, args.size, args.spp, args.bounces, secs_jnp
        )
        if headline is None:
            headline = extras["jnp_fwd_mrays"]

        if not args.no_grad:
            from pathtrace_tpu.grad import render_loss_grads

            def grad_scalar(s, c, f):
                loss, (d_scene, _) = render_loss_grads(s, c, cfg_jnp, f)
                return loss + jnp.sum(d_scene.color)

            secs_g = per_frame_seconds(grad_scalar)
            extras["fwd_bwd_mrays"] = mrays_per_sec(
                args.size, args.size, args.spp, args.bounces, secs_g
            )

    emit(headline, extras)
    return 0


if __name__ == "__main__":
    sys.exit(main())
