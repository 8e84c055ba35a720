"""Problem padding and size-bucketing for batched solving.

TPU batching requires uniform (n, m) within a batch.  Padding is designed
to be *inert*: it provably never changes the solution, iterates, statuses
or certificates of the original problem.

- Padded variables get Q = 1 on the diagonal, q = 0, A-column = 0: they
  start at 0 and stay at 0 (their Newton equations are 1*dx = 0), contribute
  nothing to any residual/objective.
- Padded constraint rows get A-row = 0, l = -QPDO_INFTY, u = +QPDO_INFTY:
  never active, inner/outer residual contributions are exactly 0, and their
  linesearch hinge terms carry delta = 0 (ignored, ops/linesearch.py).

``bucket_problems`` groups heterogeneous problems into shape buckets
(rounding n/m up to multiples) so a stream of arbitrary QPs runs as a few
lock-step batches.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .. import constants as _c
from ..types import Problem


def pad_problem(problem: Problem, n_pad: int, m_pad: int) -> Problem:
    """Pad to (n_pad, m_pad) variables/constraints, inertly."""
    n, m = problem.n, problem.m
    if n_pad < n or m_pad < m:
        raise ValueError(f"pad target ({n_pad},{m_pad}) smaller than ({n},{m})")
    dt = problem.Q.dtype
    dn, dm = n_pad - n, m_pad - m

    Q = jnp.zeros((n_pad, n_pad), dt).at[:n, :n].set(problem.Q)
    if dn:
        Q = Q.at[jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)
    q = jnp.zeros((n_pad,), dt).at[:n].set(problem.q)
    A = jnp.zeros((m_pad, n_pad), dt).at[:m, :n].set(problem.A)
    inf = jnp.asarray(_c.QPDO_INFTY, dt)
    l = jnp.full((m_pad,), -inf, dt).at[:m].set(problem.l)
    u = jnp.full((m_pad,), inf, dt).at[:m].set(problem.u)
    return Problem(Q=Q, q=q, A=A, l=l, u=u, c=problem.c)


def unpad_result(result, n: int, m: int):
    """Slice a Result of a padded problem back to original sizes."""
    return result._replace(
        x=result.x[..., :n], y=result.y[..., :m],
        prim_inf_cert=result.prim_inf_cert[..., :m],
        dual_inf_cert=result.dual_inf_cert[..., :n])


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def bucket_problems(problems: Sequence[Problem], n_mult: int = 32,
                    m_mult: int = 32
                    ) -> Dict[Tuple[int, int], Tuple[Problem, List[int]]]:
    """Group problems into padded, stacked batches by rounded shape.

    Returns {(n_pad, m_pad): (stacked Problem with leading batch axis,
    original indices)}.  Use with ``parallel.solve_batch`` per bucket and
    ``unpad_result`` + the index list to scatter results back.
    """
    groups: Dict[Tuple[int, int], List[int]] = defaultdict(list)
    for i, p in enumerate(problems):
        key = (_round_up(p.n, n_mult), _round_up(p.m, m_mult))
        groups[key].append(i)

    out = {}
    for key, idxs in groups.items():
        n_pad, m_pad = key
        padded = [pad_problem(problems[i], n_pad, m_pad) for i in idxs]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *padded)
        out[key] = (stacked, idxs)
    return out


def solve_heterogeneous(problems: Sequence[Problem], settings=None,
                        n_mult: int = 32, m_mult: int = 32):
    """Solve a list of arbitrarily-sized QPs via bucketed batched solves.

    Returns a list of per-problem Results in input order."""
    from ..parallel.batch import solve_batch

    buckets = bucket_problems(problems, n_mult, m_mult)
    results: List = [None] * len(problems)
    for (n_pad, m_pad), (stacked, idxs) in buckets.items():
        res = solve_batch(stacked, settings)
        for k, i in enumerate(idxs):
            one = jax.tree.map(lambda a: a[k], res)
            results[i] = unpad_result(one, problems[i].n, problems[i].m)
    return results
