from pathtrace_tpu.data.collect import collect_dataset, random_pose, render_pair
from pathtrace_tpu.data.patches import get_patches, patch_score

__all__ = [
    "collect_dataset",
    "random_pose",
    "render_pair",
    "get_patches",
    "patch_score",
]
