from pathtrace_tpu.parallel.mesh import make_mesh, initialize_multihost
from pathtrace_tpu.parallel.shard import render_aovs_sharded, sharded_loss_grads

__all__ = [
    "make_mesh",
    "initialize_multihost",
    "render_aovs_sharded",
    "sharded_loss_grads",
]
