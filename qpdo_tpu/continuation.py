"""Continuation (homotopy) solving: a ladder of related QPs, each
warm-started from the previous solution.

The reference has no equivalent — its answer to hard instances is "run
more iterations" (constants.h:45 caps at 1e4).  For discretized problems
(LISWET/obstacle-type: monotone-spline fitting under second-difference
constraints) the proximal dual crawls: the multipliers of an order-k
finite-difference constraint scale like n^k, and the semismooth Newton
active set moves only a bounded number of rows per iteration, so cold
iteration counts grow ~n.  Solving a coarse grid first and prolonging
(primal: interpolation; dual: interpolation x the constraint-scaling
ratio) hands the fine level a near-converged active set — measured on
LISWET n=10,000: 98,334 iterations / 1,583 s cold vs 1,777 iterations
/ 34 s over a 5-level ladder (RESULTS.md "LISWET continuation").

Two pieces:

- ``solve_continuation``: the generic driver — any list of problems (one
  per level, coarse -> fine) plus a ``prolong`` callback mapping a level's
  solution to the next level's warm start.  Levels may be dense
  ``Problem``s (-> ``qt.solve``) or sparse tuples (-> ``qt.solve_sparse``).
- ``grid1d_prolong``: the prolongation for 1-D grid families (LISWET
  class): linear interpolation for x; interior-node interpolation scaled
  by ((n_f-1)/(n_c-1))**order for y, where ``order`` is the
  finite-difference order of the constraints (2 for second differences —
  an order-k difference constraint shrinks like h^k, so its multiplier
  grows like h^-k).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional, Sequence

import numpy as np

from .types import Problem, Result, Settings


def grid1d_prolong(n_coarse: int, n_fine: int, order: int = 2):
    """Prolongation between two uniform 1-D grids with m = n - order
    constraint rows (one per interior stencil position).

    Returns ``prolong(x, y) -> (x0, y0)``: x by linear interpolation on
    [0, 1]; y by interpolation over the constraint-row grid, scaled by
    ``((n_fine-1)/(n_coarse-1)) ** order`` (the multiplier of an order-k
    difference constraint scales like h^-k).
    """
    tc = np.linspace(0.0, 1.0, n_coarse)
    tf = np.linspace(0.0, 1.0, n_fine)
    # constraint row i covers nodes i..i+order; place it at its center
    rc = tc[:n_coarse - order] + 0.5 * order / max(n_coarse - 1, 1)
    rf = tf[:n_fine - order] + 0.5 * order / max(n_fine - 1, 1)
    scale = ((n_fine - 1) / (n_coarse - 1)) ** order

    def prolong(x, y):
        x = np.asarray(x)
        y = np.asarray(y)
        return np.interp(tf, tc, x), np.interp(rf, rc, y) * scale

    return prolong


def grid2d_interp(k_coarse: int, k_fine: int, v, boundary=None):
    """Bilinear interpolation of a flattened (row-major) k_c x k_c
    interior-point grid field onto k_f x k_f, with the grids
    t_i = (i+1)/(k+1) of a Dirichlet discretization.

    The fine grid extends past the coarse hull (its first/last interior
    nodes sit closer to the boundary); ``boundary`` controls that strip:
    ``None`` replicates the edge value (right for multiplier/control
    fields), a scalar pads the grid with the known boundary value first
    (0.0 for a Dirichlet state field).

    The 2-D building block for PDE-constrained ladders (CONT-class
    problems, benchmarks/mm_like.gen_cont): a prolong callback interpolates
    each state/control/multiplier field separately, applies the field's
    resolution scaling, and reassembles the level's variable layout.
    Primal fields and box-row duals are resolution-invariant (scale 1);
    multipliers of an undivided second-order stencil row (the 4/-1
    Laplacian) scale like ((k_f+1)/(k_c+1))**2 — for smooth lam the
    stencil cancels to h^2*laplace(lam), so matching an O(1) objective
    gradient forces lam ~ h^-2 (the 2-D analogue of grid1d_prolong's
    h^-order scaling).
    """
    tc = (np.arange(k_coarse) + 1.0) / (k_coarse + 1.0)
    tf = (np.arange(k_fine) + 1.0) / (k_fine + 1.0)
    V = np.asarray(v, float).reshape(k_coarse, k_coarse)
    if boundary is not None:
        tc = np.concatenate([[0.0], tc, [1.0]])
        V = np.pad(V, 1, constant_values=float(boundary))
    Vr = np.stack([np.interp(tf, tc, row) for row in V])          # rows
    return np.stack([np.interp(tf, tc, Vr[:, j])
                     for j in range(k_fine)], axis=1).ravel()     # cols


def solve_continuation(problems: Sequence,
                       settings: Optional[Settings] = None,
                       prolong: Optional[Callable] = None,
                       dtype=None,
                       return_all: bool = False,
                       refine_final: bool = False,
                       progress: Optional[Callable] = None,
                       resume_path: Optional[str] = None):
    """Solve a coarse-to-fine ladder of QPs, warm-starting each level.

    ``problems``: one entry per level.  Each entry is either a dense
    ``Problem`` (solved with ``qt.solve``) or a tuple
    ``(Q, q, A, l, u[, c])`` with scipy-sparse/dense Q, A (solved with
    ``qt.solve_sparse``, the large-n path).

    ``prolong``: ``prolong(x, y, level) -> (x0, y0)`` maps level
    ``level``'s unscaled solution to level ``level+1``'s warm start.
    ``None`` passes solutions through unchanged (identity continuation —
    the parametric/homotopy case where all levels share one shape, e.g.
    a data or settings ramp).  Callbacks taking only ``(x, y)`` (e.g.
    ``grid1d_prolong(...)``) are accepted too.

    ``refine_final``: recompute the finest level's KKT residuals from the
    raw data (host-side, float64) and warm re-solve that level once if
    either exceeds ``settings.eps_abs``.  A warm ladder level can stop
    with sigma*(x - xbar) of the not-yet-recentered proximal term still
    inside its residual estimate (the reference's own termination
    semantics, termination.c:200-202); the re-solve resets the prox
    center and typically closes the gap in ~1 iteration (measured on
    LISWET n=90,000, RESULTS.md).

    ``resume_path``: PROCESS-LEVEL resume file (``.npz``).  After every
    completed level the unscaled solution is written there; a fresh
    process started with the same path skips the completed levels and
    prolongs the saved solution forward.  This is the recovery tier
    ABOVE the in-process crash_recovery machinery: the axon fault class
    can leave the in-process client unable to reattach even after
    ``clear_backends`` (the round-5 n=90k ladder watched 8 restore
    backoffs fail while fresh-subprocess probes passed), and only a
    process restart recovers — an outer retry loop around the script
    plus ``resume_path`` turns that into a resumed ladder instead of a
    lost one.  With resume active, ``return_all`` carries ``None`` for
    the skipped levels.

    Returns the finest level's ``Result`` (``info.run_time`` covers the
    whole ladder), or every level's when ``return_all``.
    """
    from .api import solve, solve_sparse

    if settings is None:
        settings = Settings()
    if not problems:
        raise ValueError("solve_continuation: empty problem list")

    def _prolong(x, y, i):
        if prolong is None:
            return x, y
        try:
            return prolong(x, y, i)
        except TypeError:
            return prolong(x, y)

    t0 = time.perf_counter()
    x0 = y0 = None
    start = 0
    if resume_path is not None and os.path.exists(resume_path):
        snap = np.load(resume_path)
        lvl = int(snap["level"])
        x_s, y_s = snap["x"], snap["y"]
        if lvl + 1 < len(problems):
            x0, y0 = _prolong(x_s, y_s, lvl)
            start = lvl + 1
        else:  # finest already recorded: warm re-solve it from itself
            x0, y0 = x_s, y_s
            start = lvl

    results = []
    for i, p in enumerate(problems):
        if i < start:
            results.append(None)
            continue
        if isinstance(p, Problem):
            res = solve(p, settings, x0=x0, y0=y0)
        else:
            Q, q, A, l, u = p[:5]
            c = p[5] if len(p) > 5 else 0.0
            res = solve_sparse(Q, q, A, l, u, c, settings=settings,
                               x0=x0, y0=y0, dtype=dtype)
        results.append(res)
        x, y = np.asarray(res.x), np.asarray(res.y)
        if resume_path is not None:
            # persist BEFORE any callback: the level is complete the
            # moment the solve returns (atomic via tmp+rename)
            tmp = resume_path + ".tmp.npz"
            np.savez(tmp, level=i, x=x, y=y)
            os.replace(tmp, resume_path)
        if progress is not None:
            # per-level hook so long ladders leave evidence as they go
            # (a device fault mid-ladder must not erase finished levels)
            progress(i, res)
        if i + 1 < len(problems):
            x0, y0 = _prolong(x, y, i)

    if refine_final:
        p = problems[-1]
        res = results[-1]
        if isinstance(p, Problem):
            Q, q, A, l, u = (np.asarray(p.Q), np.asarray(p.q),
                             np.asarray(p.A), np.asarray(p.l),
                             np.asarray(p.u))
        else:
            Q, q, A, l, u = p[:5]
        x, y = np.asarray(res.x), np.asarray(res.y)
        Ax = np.asarray(A @ x)
        rp = np.abs(Ax - np.clip(Ax + y, l, u)).max()
        rd = np.abs(Q @ x + q + A.T @ y).max()
        if rp > settings.eps_abs or rd > settings.eps_abs:
            if isinstance(p, Problem):
                res = solve(p, settings, x0=res.x, y0=res.y)
            else:
                c = p[5] if len(p) > 5 else 0.0
                res = solve_sparse(*p[:5], c, settings=settings,
                                   x0=res.x, y0=res.y, dtype=dtype)
            results[-1] = res

    total = time.perf_counter() - t0
    final = results[-1]
    final = final._replace(info=final.info._replace(run_time=total))
    results[-1] = final
    return results if return_all else final
