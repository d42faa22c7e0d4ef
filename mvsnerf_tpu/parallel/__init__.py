from .mesh import make_mesh, local_mesh
from .sharding import shard_rays_render, data_parallel_step, replicate
