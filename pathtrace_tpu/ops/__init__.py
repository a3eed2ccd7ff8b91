from pathtrace_tpu.ops.intersect import intersect_scene, intersect_spheres, shadow_visibility
from pathtrace_tpu.ops.sampling import cosine_weighted_direction, ortho_vector
from pathtrace_tpu.ops.trace import trace_paths, TraceResult

__all__ = [
    "intersect_scene",
    "intersect_spheres",
    "shadow_visibility",
    "cosine_weighted_direction",
    "ortho_vector",
    "trace_paths",
    "TraceResult",
]
