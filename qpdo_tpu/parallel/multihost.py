"""Multi-host runtime helpers.

The reference is a single-thread library with no distributed anything
(SURVEY.md §2.4).  Scale-out here is data-parallel batch sharding over all
devices of a multi-host TPU slice:

    initialize()                       # per process, before device use
    mesh = global_mesh("batch")        # all devices, all hosts
    problems = distribute_batch(local_problems, mesh)
    res = solve_batch_sharded(problems, mesh)

DCN coordination comes from ``jax.distributed``; the only cross-host
traffic during a solve is the while-loop convergence all-reduce.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..types import Problem


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks; no-op when
    single-process."""
    if num_processes is None and coordinator_address is None:
        # single-process / auto-detected environments (TPU pods set env vars)
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # already initialized or single-process
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis: str = "batch") -> Mesh:
    """1-D mesh over every device of every participating process."""
    return Mesh(np.array(jax.devices()), (axis,))


def distribute_batch(local_problems: Problem, mesh: Mesh,
                     axis: str = "batch") -> Problem:
    """Assemble a global sharded batch from per-process local shards.

    Each process passes its local batch (equal sizes across processes);
    leaves become global arrays of shape (num_processes * local_B, ...)."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x))
    return jax.tree.map(put, local_problems)
