"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: forward-render throughput of the Pallas megakernel on the
BASELINE workload (Cornell box, 512x512, 32 spp, 5 bounces), in
Mrays/s/chip where rays = W*H*spp*bounces path segments. Auxiliary fields
report the jnp (differentiable) backend forward and forward+backward
throughput when available.

Usage: python bench.py [--size 512] [--spp 32] [--quick]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def _prior_value() -> float | None:
    """Best previous recorded bench value (BENCH_r*.json), for vs_baseline."""
    best = None
    for path in glob.glob(os.path.join(os.path.dirname(__file__) or ".", "BENCH_r*.json")):
        try:
            with open(path) as f:
                rec = json.load(f)
            v = float(rec.get("value", 0.0))
            if v > 0 and (best is None or v > best):
                best = v
        except Exception:
            pass
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--bounces", type=int, default=5)
    ap.add_argument("--quick", action="store_true", help="128x128x4spp smoke")
    ap.add_argument("--no-grad", action="store_true", help="skip fwd+bwd timing")
    args = ap.parse_args()
    if args.quick:
        args.size, args.spp = 128, 4

    import jax

    from pathtrace_tpu import Camera, RenderConfig, cornell_box
    from pathtrace_tpu.utils.timing import mrays_per_sec, time_fn

    backend = jax.default_backend()
    scene = cornell_box()
    cam = Camera.create()
    n_rays = args.size * args.size * args.spp * args.bounces

    extras = {}

    # -- Pallas megakernel forward (TPU) / jnp fallback elsewhere ----------
    if backend in ("tpu", "axon"):
        from pathtrace_tpu.ops.pallas_trace import render_channels_pallas

        cfg = RenderConfig(
            width=args.size, height=args.size, spp=args.spp,
            max_bounces=args.bounces, backend="pallas",
        )
        secs, _ = time_fn(
            lambda f: render_channels_pallas(scene, cam, cfg, f),
            0, warmup=1, iters=3,
        )
        headline = mrays_per_sec(args.size, args.size, args.spp, args.bounces, secs)
        extras["pallas_fwd_ms"] = secs * 1e3
    else:
        headline = None

    # -- jnp (differentiable oracle) forward --------------------------------
    from pathtrace_tpu.render import render_channels

    spp_chunk = 8 if args.spp > 8 else 0
    cfg_jnp = RenderConfig(
        width=args.size, height=args.size, spp=args.spp,
        max_bounces=args.bounces, backend="jnp", spp_chunk=spp_chunk,
    )
    secs_jnp, _ = time_fn(
        lambda f: render_channels(scene, cam, cfg_jnp, f), 0, warmup=1, iters=3
    )
    extras["jnp_fwd_mrays"] = mrays_per_sec(
        args.size, args.size, args.spp, args.bounces, secs_jnp
    )
    if headline is None:
        headline = extras["jnp_fwd_mrays"]

    # -- jnp forward+backward (pixel-loss grads w.r.t. scene+camera) --------
    if not args.no_grad:
        try:
            from pathtrace_tpu.grad import render_loss_grads

            secs_g, _ = time_fn(
                lambda f: render_loss_grads(scene, cam, cfg_jnp, f),
                0, warmup=1, iters=3,
            )
            extras["fwd_bwd_mrays"] = mrays_per_sec(
                args.size, args.size, args.spp, args.bounces, secs_g
            )
        except ImportError:
            pass

    prior = _prior_value()
    result = {
        "metric": f"Mrays/s/chip fwd (Cornell {args.size}^2 x {args.spp}spp x {args.bounces} bounces)",
        "value": round(headline, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(headline / prior, 3) if prior else 1.0,
        "backend": backend,
        "n_rays_per_frame": n_rays,
        **{k: round(v, 3) for k, v in extras.items()},
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
