from . import mesh
from .mesh import (data_sharding, local_rank, make_mesh, nranks, replicated,
                   shard_batch)
