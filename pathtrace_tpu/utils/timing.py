"""Timing + throughput instrumentation.

The reference brackets each kernel with cudaEvents and prints ms/fps
(``include/Renderer.h:63-75``, ``src/main.cu:183``). The JAX equivalent is
``block_until_ready`` walls around jitted calls, plus the derived
throughput metric used across this repo:

    Mrays/s = W * H * spp * max_bounces / time

(path segments per second; SURVEY.md §5 "Tracing / profiling").
``jax.profiler`` traces can be captured with the ``trace`` helper.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Callable

import jax


def _force(result):
    """Synchronize AND read back one element to the host. On the tunneled
    axon backend, ``block_until_ready`` alone has been observed to return
    before the computation finishes; a host readback of a data-dependent
    element cannot lie."""
    import numpy as np

    leaf = jax.tree.leaves(result)[0]
    jax.block_until_ready(leaf)
    np.asarray(leaf.ravel()[0:1])  # 1-element device slice -> 4-byte fetch
    return result


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 5, **kwargs):
    """Mean wall time of ``fn(*args)``: ``iters`` chained dispatches timed
    as a batch and forced with a host readback (amortizes dispatch/tunnel
    latency while defeating async-timing artifacts). Returns
    (seconds, last_result)."""
    result = None
    for _ in range(max(warmup, 1)):
        result = _force(fn(*args, **kwargs))
    iters = max(iters, 1)
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args, **kwargs)
    _force(result)
    return (time.perf_counter() - t0) / iters, result


def mrays_per_sec(width: int, height: int, spp: int, max_bounces: int, seconds: float):
    return width * height * spp * max_bounces / seconds / 1e6


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (TPU equivalent of nvprof/NVTX which the
    reference never had)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """Structured per-frame/per-step metrics to stdout and optional JSONL
    (SURVEY.md §5 'Metrics / logging')."""

    def __init__(self, jsonl_path=None, quiet=False):
        self.path = jsonl_path
        self.quiet = quiet
        self._fh = open(jsonl_path, "a") if jsonl_path else None

    def log(self, **fields):
        fields.setdefault("ts", time.time())
        if not self.quiet:
            printable = {k: v for k, v in fields.items() if k != "ts"}
            print(" ".join(f"{k}={v}" for k, v in printable.items()))
        if self._fh:
            self._fh.write(json.dumps(fields) + "\n")
            self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()
