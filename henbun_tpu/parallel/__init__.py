"""Multi-chip scaling: device meshes, sharded training, sharded samplers."""
from . import mesh
from .mesh import make_mesh, DATA_AXIS, CHAIN_AXIS, initialize_distributed
from .sharding import ShardedOptimizer, ShardedBatchedOptimizer
