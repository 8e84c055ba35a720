from .batch import solve_batch, solve_batch_sharded, shard_problems
from . import multihost
