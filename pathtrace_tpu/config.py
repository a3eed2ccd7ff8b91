"""Render configuration.

One dataclass replaces the reference's boost::program_options flag soup
(reference ``src/main.cu:20-46``). Defaults match the reference exactly:
size 512, 4 spp, camera (50, 52, 295.6) yaw -90 pitch 0, output
``output/out`` (reference ``src/main.cu:20-29``). The reference's
``threads-per-block`` (CUDA block edge) maps to ``tile_shape`` — the Pallas
tile footprint, which on TPU wants (8, 128)-aligned blocks rather than 8x8
CUDA blocks.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# MAX_BOUNCES and PUSH_RAY_ORIGIN mirror reference src/pathtrace.cu:7-8.
MAX_BOUNCES = 5
PUSH_RAY_ORIGIN = 0.05
# Channel count of the AOV feature buffer (reference include/OutputBuffer.h).
NUM_CHANNELS = 14

# Channel layout of the packed feature buffer, identical ordering to the
# reference's buffer writes (src/pathtrace.cu:240-254).
CHANNEL_NAMES = (
    "color_r", "color_g", "color_b",
    "normal_x", "normal_y", "normal_z",
    "albedo_r", "albedo_g", "albedo_b",
    "depth",
    "color_var", "normal_var", "albedo_var", "depth_var",
)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static configuration of a render; hashable so it can be a jit static arg.

    Attributes:
      width, height: image size in pixels. The reference is square-only
        (``src/main.cu:66-67``); we support rectangular images.
      spp: samples per pixel (reference ``--samples``, default 4).
      max_bounces: path depth; compile-time 5 in the reference
        (``src/pathtrace.cu:7``).
      spp_chunk: samples are traced in chunks of this size with partial
        moments merged associatively (Chan's formula) between chunks —
        bounds memory for high spp and is the same merge used across mesh
        shards. 0 means a single chunk.
      backend: "jnp" (pure-JAX wavefront, differentiable oracle),
        "pallas" (TPU megakernel fast path), or "auto".
      jitter: sub-pixel jitter. The reference jitters iff spp != 1
        (``src/pathtrace.cu:222-225``); None reproduces that, True/False
        forces.
      seed: RNG seed; reference seeds curand per-pixel with the pixel id
        (``src/pathtrace.cu:265``), we fold a global seed with (sample,
        pixel) into threefry counters.
    """

    width: int = 512
    height: int = 512
    spp: int = 4
    max_bounces: int = MAX_BOUNCES
    spp_chunk: int = 0
    backend: str = "auto"
    jitter: bool | None = None
    seed: int = 0
    push_ray_origin: float = PUSH_RAY_ORIGIN
    # (8, 256) won the v5e tile sweep for BOTH the forward megakernel
    # (5.36 vs 5.15 Grays/s at 512^2x32spp) and the fused fwd+bwd kernel
    # (4.31 vs 4.09) over the old (16, 256) — the grad kernels hold ~130
    # live (th, tw) f32 arrays, so the smaller tile relieves VMEM pressure;
    # measured interleaved best-of-6 to cancel shared-chip drift.
    tile_shape: Tuple[int, int] = (8, 256)
    # Next-event estimation (the reference's dormant getDirectLighting,
    # pathtrace.cu:138-148,169): off by default for image parity; when on,
    # the light index matches the reference's hard-coded 8.
    nee: bool = False
    light_index: int = 8
    # BRDF: "diffuse" (cosine-weighted, the reference's shipped path) or
    # "glossy" — the reference's commented-out "makeshift glossy BRDF"
    # experiment (pathtrace.cu:181-184: reflect the sampled direction about
    # the normal, perturb by 0.01*uniform3 - 0.005, renormalize), shipped
    # here as a working option on BOTH backends (each draws the same
    # 5-slot-per-bounce lattice: 2 cosine + 3 perturbation uniforms).
    brdf: str = "diffuse"

    @property
    def slots_per_bounce(self) -> int:
        return 5 if self.brdf == "glossy" else 2

    @property
    def resolved_jitter(self) -> bool:
        if self.jitter is None:
            return self.spp != 1
        return self.jitter

    @property
    def num_pixels(self) -> int:
        return self.width * self.height

    def chunks(self) -> list[int]:
        """Split spp into chunk sizes."""
        if self.spp_chunk <= 0 or self.spp_chunk >= self.spp:
            return [self.spp]
        n_full, rem = divmod(self.spp, self.spp_chunk)
        return [self.spp_chunk] * n_full + ([rem] if rem else [])
