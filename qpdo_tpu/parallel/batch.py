"""Batched and sharded solving — the TPU scaling story.

The reference solves one QP per process (src/qpdo.c:343-449, single
threaded).  Here the whole solver is ``vmap``-ed over a batch of QPs with
identical (n, m): the masked step function (solver/core.py) makes every
problem take lock-step iterations with per-problem status latching, so a
batch runs as large fused MXU ops (batched KKT formation, batched Cholesky,
batched triangular solves) until every problem has converged.

Scale-out across chips/hosts is data-parallel: shard the batch axis of every
leaf over a ``jax.sharding.Mesh`` and let XLA partition the computation; the
only cross-device communication is the while-loop convergence reduction
(an ``all-reduce`` of a few bytes per iteration over ICI).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver.core import solve_scaled
from ..solver.scaling import scale_problem
from ..types import Problem, Result, Settings


@functools.partial(jax.jit, static_argnames=("settings", "warm_x", "warm_y"))
def _solve_batch(problems: Problem, settings: Settings, x0, y0,
                 warm_x: bool, warm_y: bool) -> Result:
    def one(p, xw, yw):
        sp = scale_problem(p, settings.scaling)
        return solve_scaled(sp, settings, xw, yw, warm_x, warm_y)

    in_axes = (0, 0 if warm_x else None, 0 if warm_y else None)
    return jax.vmap(one, in_axes=in_axes)(problems, x0, y0)


def solve_batch(problems: Problem, settings: Optional[Settings] = None,
                x0=None, y0=None) -> Result:
    """Solve a batch of QPs (leading batch axis on every Problem leaf)."""
    settings = settings or Settings()
    return _solve_batch(problems, settings, x0, y0,
                        x0 is not None, y0 is not None)


def shard_problems(problems: Problem, mesh: Mesh, axis: str = "batch") -> Problem:
    """Place a batch of problems with the batch axis sharded over ``mesh``."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, problems)


def solve_batch_sharded(problems: Problem, mesh: Mesh,
                        settings: Optional[Settings] = None,
                        x0=None, y0=None, axis: str = "batch") -> Result:
    """Data-parallel batched solve: shard the batch over the mesh and let
    XLA partition the lock-step solver (the TPU equivalent of the missing
    parallelism row in SURVEY.md §2.4)."""
    problems = shard_problems(problems, mesh, axis)
    if x0 is not None:
        x0 = jax.device_put(x0, NamedSharding(mesh, P(axis, None)))
    if y0 is not None:
        y0 = jax.device_put(y0, NamedSharding(mesh, P(axis, None)))
    return solve_batch(problems, settings, x0, y0)
