"""Row-sharded single-QP solving: constraints distributed over devices.

The sequence-parallel analogue for QP (SURVEY.md §5): one large QP whose
*constraint rows* are sharded over the mesh — the axis that grows without
bound in SVM/portfolio/scenario formulations (m >> n).  Per iteration:

- every dual-side quantity (y, mu, Ax, residuals, the active-set weights)
  lives sharded on the rows axis and is updated locally;
- the KKT formation ``A' (w o A)`` and every ``A' v`` matvec contract the
  sharded rows axis — XLA inserts one psum each over ICI;
- the (n x n) factorization and primal vectors are replicated (n is the
  small axis by assumption);
- the exact linesearch runs the *sort-free* bisection form
  (ops/linesearch.py pwa_root_bisect): each of its ~48 derivative
  evaluations is two masked reductions (psum) instead of a 2m-element
  global sort, which is why the sorted-scan path is the wrong shape here.

No reference equivalent (the reference is single-threaded;
SURVEY.md §2.4); algorithm semantics are the shared core's.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import constants as _c
from ..types import Problem, Result, Settings


def pad_rows(problem: Problem, mult: int) -> Problem:
    """Pad constraint rows to a multiple of ``mult`` with inert free rows
    (A=0, l=-inf, u=+inf — same trick as utils/padding.pad_problem)."""
    m = problem.m
    m_pad = -(-m // mult) * mult
    if m_pad == m:
        return problem
    dt = problem.A.dtype
    extra = m_pad - m
    inf = jnp.asarray(_c.QPDO_INFTY, dt)
    return problem._replace(
        A=jnp.concatenate([problem.A,
                           jnp.zeros((extra, problem.n), dt)], axis=0),
        l=jnp.concatenate([problem.l, jnp.full((extra,), -inf, dt)]),
        u=jnp.concatenate([problem.u, jnp.full((extra,), inf, dt)]))


def solve_row_sharded(problem: Problem,
                      settings: Optional[Settings] = None,
                      x0=None, y0=None,
                      mesh: Optional[Mesh] = None,
                      axis_name: str = "rows") -> Result:
    """Solve one QP with its m constraint rows sharded over the mesh.

    Rows are padded to a device-count multiple with inert rows (results are
    unaffected; the padded tail of ``y`` solves to 0).  Returns the Result
    on the padded shapes; rows beyond ``problem.m`` are padding.
    """
    from ..api import _solve_full  # jitted core entry

    settings = settings or Settings()
    if settings.linesearch != "bisect":
        # the sorted-scan linesearch would gather the sharded rows axis
        settings = settings.replace(linesearch="bisect")

    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), (axis_name,))
    ndev = mesh.shape[axis_name]
    m_orig = problem.m
    problem = pad_rows(problem, ndev)

    row = NamedSharding(mesh, P(axis_name))
    mat = NamedSharding(mesh, P(axis_name, None))
    repl = NamedSharding(mesh, P())
    problem = Problem(
        Q=jax.device_put(problem.Q, repl),
        q=jax.device_put(problem.q, repl),
        A=jax.device_put(problem.A, mat),
        l=jax.device_put(problem.l, row),
        u=jax.device_put(problem.u, row),
        c=jax.device_put(problem.c, repl))
    if x0 is not None:
        x0 = jax.device_put(jnp.asarray(x0, problem.q.dtype), repl)
    if y0 is not None:
        y0 = jax.device_put(pad_rows_vec(jnp.asarray(y0, problem.q.dtype),
                                         problem.m), row)
    res = _solve_full(problem, settings, x0, y0,
                      x0 is not None, y0 is not None)
    return res, m_orig


def pad_rows_vec(y, m_pad: int):
    m = y.shape[0]
    if m_pad == m:
        return y
    return jnp.concatenate([y, jnp.zeros((m_pad - m,), y.dtype)])
