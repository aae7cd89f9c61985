from reconstruction_tpu.parallel.mesh import make_mesh, mesh_axes  # noqa: F401
from reconstruction_tpu.parallel.sharded import (  # noqa: F401
    match_level_pairs_sharded, refine_tiled)
from reconstruction_tpu.parallel.distributed_ba import ba_step_sharded  # noqa: F401
