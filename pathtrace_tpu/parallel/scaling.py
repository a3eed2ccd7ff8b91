"""Scaling-efficiency measurement harness.

BASELINE gate: >=80% scaling efficiency at >=2 hosts. This harness times
the sharded render/training step on sub-meshes of increasing size and
reports efficiency = T(1) / (N * T(N)) per mesh shape. On CI it runs on
the virtual CPU mesh (a functional check of the measurement machinery, not
a hardware claim); on a real pod the same entry point produces the
reportable numbers.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax

from pathtrace_tpu.config import RenderConfig
from pathtrace_tpu.parallel.mesh import make_mesh
from pathtrace_tpu.parallel.shard import render_channels_sharded
from pathtrace_tpu.utils.timing import time_fn


def measure_scaling(
    scene,
    cam,
    cfg: RenderConfig,
    device_counts: Optional[Sequence[int]] = None,
    samples_axis: int = 1,
    iters: int = 3,
) -> List[Dict]:
    """Time the sharded forward render on 1..N devices.

    Returns a list of {devices, seconds, mrays, efficiency} dicts, where
    efficiency is relative to the 1-device run (fixed global work — strong
    scaling).
    """
    all_devices = jax.devices()
    if device_counts is None:
        device_counts = [
            n for n in (1, 2, 4, 8, 16, 32) if n <= len(all_devices)
        ]
    results: List[Dict] = []
    base_secs = None
    for n in device_counts:
        samples = samples_axis if n % samples_axis == 0 and n >= samples_axis else 1
        mesh = make_mesh(
            tiles=n // samples, samples=samples, devices=all_devices[:n]
        )
        secs, _ = time_fn(
            lambda f, m=mesh: render_channels_sharded(scene, cam, cfg, m, f),
            0,
            warmup=1,
            iters=iters,
        )
        if base_secs is None:
            base_secs = secs
        mrays = cfg.width * cfg.height * cfg.spp * cfg.max_bounces / secs / 1e6
        results.append(
            {
                "devices": n,
                "mesh": dict(mesh.shape),
                "seconds": secs,
                "mrays": mrays,
                "efficiency": base_secs / (n * secs),
            }
        )
    return results
