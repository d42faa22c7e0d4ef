from .mesh import (make_mesh, local_mesh, make_mesh_2d, init_distributed,
                   RAY_AXIS, DATA_AXIS)
from .sharding import shard_rays_render, data_parallel_step, replicate
