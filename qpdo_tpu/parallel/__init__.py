from .batch import solve_batch, solve_batch_sharded, shard_problems
from .row_sharded import solve_row_sharded
from . import multihost
