"""Gradient-gate phase A: the CPU f64 oracle (run on CPU, no TPU needed).

Produces ``results/grad_oracle/oracle.npz`` consumed by scripts/grad_gate.py:

1. Records the frozen-decision trace of the BASELINE config (512^2 x 32 spp,
   NEE) with the f32 renderer arithmetic (ops/frozen.py — bitwise the eager
   renderer).
2. f32 gradients of the frozen replay — the live detached-decision
   estimator's gradients ON EXACTLY THESE DECISIONS (no borderline-lane
   flips vs the record, unlike comparing two independently-compiled
   pipelines), so |f32 - f64| isolates pure f32 ACCUMULATION error.
3. f64 gradients of the same replay — the oracle: same real-arithmetic
   function, ~1e-16 rounding.
4. f64 central finite differences of the frozen replay for geometry/camera
   scalars — a true derivative check with silhouette terms structurally
   absent (decisions cannot flip inside the bracket). FD probes run at a
   reduced spp (the estimator is a per-sample sum; every gradient code path
   is exercised by any sample subset) to keep the 2-core f64 CPU cost sane;
   the AD side is evaluated at the same spp for exact comparability.

Usage: JAX_PLATFORMS=cpu python scripts/grad_oracle_cpu.py [--size 512]
       [--spp 32] [--fd-spp 8] [--out results/grad_oracle/oracle.npz]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tree_to_flat(ds, dc):
    return {
        "d_radius": np.asarray(ds.radius, np.float64),
        "d_position": np.asarray(ds.position, np.float64),
        "d_emission": np.asarray(ds.emission, np.float64),
        "d_albedo": np.asarray(ds.color, np.float64),
        "d_cam_position": np.asarray(dc.position, np.float64),
        "d_cam_yaw": np.asarray(dc.yaw, np.float64),
        "d_cam_pitch": np.asarray(dc.pitch, np.float64),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--fd-spp", type=int, default=8)
    ap.add_argument("--out", type=str, default="results/grad_oracle/oracle.npz")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from pathtrace_tpu import Camera, RenderConfig, cornell_box
    from pathtrace_tpu.ops.frozen import (
        record_frame,
        replay_loss_grads,
        replay_loss,
    )

    scene, cam = cornell_box(), Camera.create()
    S, SPP = args.size, args.spp
    cfg = dataclasses.replace(
        RenderConfig(width=S, height=S, spp=SPP, backend="jnp", spp_chunk=2),
        nee=True,
    )
    target = jnp.zeros((S, S, 3), jnp.float32)
    out = {"size": S, "spp": SPP, "fd_spp": args.fd_spp}

    t0 = time.time()
    color, recs = record_frame(scene, cam, cfg)
    out["record_color"] = np.asarray(color, np.float32)
    print(f"[A1] recorded {S}^2 x {SPP} spp in {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    loss32, (ds32, dc32) = replay_loss_grads(scene, cam, cfg, 0, recs, target)
    out["loss_f32"] = float(loss32)
    for k, v in tree_to_flat(ds32, dc32).items():
        out[f"f32_{k}"] = v
    print(f"[A2] f32 replay grads in {time.time()-t0:.0f}s", flush=True)

    with jax.enable_x64(True):
        t0 = time.time()
        loss64, (ds64, dc64) = replay_loss_grads(
            scene, cam, cfg, 0, recs, target, dtype=jnp.float64
        )
        out["loss_f64"] = float(loss64)
        for k, v in tree_to_flat(ds64, dc64).items():
            out[f"f64_{k}"] = v
        print(f"[A3] f64 oracle grads in {time.time()-t0:.0f}s", flush=True)

        # -- FD probes at reduced spp ------------------------------------
        cfg_fd = dataclasses.replace(cfg, spp=args.fd_spp)
        recs_fd = recs[: max(1, args.fd_spp // max(cfg.spp_chunk, 1))]
        _, (dsf, dcf) = replay_loss_grads(
            scene, cam, cfg_fd, 0, recs_fd, target, dtype=jnp.float64
        )
        scene64 = scene.replace(
            radius=scene.radius.astype(jnp.float64),
            position=scene.position.astype(jnp.float64),
            emission=scene.emission.astype(jnp.float64),
            color=scene.color.astype(jnp.float64),
        )
        cam64 = dataclasses.replace(
            cam,
            position=cam.position.astype(jnp.float64),
            yaw=cam.yaw.astype(jnp.float64),
            pitch=cam.pitch.astype(jnp.float64),
        )

        def L(s, c):
            return float(
                replay_loss(s, c, cfg_fd, 0, recs_fd, target, dtype=jnp.float64)
            )

        # eps on each parameter's FD plateau (tests/test_frozen.py): wide
        # brackets hit grazing-lane sqrt curvature, narrow ones the
        # piecewise-smooth kink floor.
        probes = {
            "sphere6_pos_z": (
                float(dsf.position[6, 2]),
                lambda h: (
                    scene64.replace(position=scene64.position.at[6, 2].add(h)),
                    cam64,
                ),
                1e-3,
            ),
            "sphere6_radius": (
                float(dsf.radius[6]),
                lambda h: (scene64.replace(radius=scene64.radius.at[6].add(h)), cam64),
                1e-4,
            ),
            "camera_pos_z": (
                float(dcf.position[2]),
                lambda h: (
                    scene64,
                    dataclasses.replace(
                        cam64, position=cam64.position.at[2].add(h)
                    ),
                ),
                2e-3,
            ),
            "camera_yaw": (
                float(dcf.yaw),
                lambda h: (scene64, dataclasses.replace(cam64, yaw=cam64.yaw + h)),
                1e-4,
            ),
        }
        fd_rows = []
        for name, (ad, pert, eps) in probes.items():
            t0 = time.time()
            sp, cp = pert(eps)
            sm, cm = pert(-eps)
            fd = (L(sp, cp) - L(sm, cm)) / (2 * eps)
            fd_rows.append((name, ad, fd, eps))
            print(
                f"[A4] FD {name}: ad={ad:.6e} fd={fd:.6e} eps={eps:g} "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )
        out["fd_names"] = np.array([r[0] for r in fd_rows])
        out["fd_ad"] = np.array([r[1] for r in fd_rows], np.float64)
        out["fd_fd"] = np.array([r[2] for r in fd_rows], np.float64)
        out["fd_eps"] = np.array([r[3] for r in fd_rows], np.float64)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **out)
    print(f"[done] wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
