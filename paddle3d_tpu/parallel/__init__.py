from . import mesh, tp
from .mesh import (data_sharding, local_rank, make_mesh, nranks, replicated,
                   shard_batch)
from .tp import tp_shard_module
