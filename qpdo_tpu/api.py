"""Public API: functional ``solve`` and the stateful ``QPDO`` class.

The lifecycle API mirrors the reference driver (include/qpdo.h:14-56 and the
MATLAB class interfaces/mex/qpdo.m): setup / warm_start / solve /
update_q / update_bounds / update_settings, with the same in-place rescaling
rules for parametric updates (qpdo.c:481-586).
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as _c
from .solver.core import solve_scaled
from .solver.driver import solve_driven
from .solver.scaling import (scale_problem, ruiz_equilibrate,
                             ruiz_equilibrate_kkt)
from .types import Problem, Result, ScaledProblem, Scaling, Settings
from .validate import validate_data, validate_settings

_scale_jit = jax.jit(scale_problem,
                     static_argnames=("scaling_iters", "ruiz_kkt"))


def _needs_host_driver(settings: Settings) -> bool:
    return settings.verbose or settings.max_time < _c.QPDO_INFTY


def make_problem(Q, q, A, l, u, c=0.0, dtype=None) -> Problem:
    """Build a Problem from array-likes, clamping +-inf bounds to
    +-QPDO_INFTY (the MATLAB wrapper does the same, interfaces/mex/qpdo.m)."""
    Q = jnp.asarray(Q, dtype)
    dt = Q.dtype
    inf = _c.QPDO_INFTY
    n = Q.shape[-1]
    A = jnp.asarray(A, dt).reshape(-1, n)
    l = jnp.clip(jnp.asarray(l, dt).reshape(-1), -inf, inf)
    u = jnp.clip(jnp.asarray(u, dt).reshape(-1), -inf, inf)
    if A.shape[0] == 0:
        # unconstrained QP: synthesize one inert free row (the MATLAB
        # wrapper's empty-input defaults, interfaces/mex/qpdo.m:60-133;
        # the core assumes m >= 1)
        A = jnp.zeros((1, n), dt)
        l = jnp.full((1,), -inf, dt)
        u = jnp.full((1,), inf, dt)
    return Problem(
        Q=Q,
        q=jnp.asarray(q, dt).reshape(-1),
        A=A,
        l=l,
        u=u,
        c=jnp.asarray(c, dt),
    )


@functools.partial(jax.jit, static_argnames=("settings", "warm_x", "warm_y"))
def _solve_full(problem: Problem, settings: Settings, x0, y0,
                warm_x: bool, warm_y: bool) -> Result:
    sp = scale_problem(problem, settings.scaling, settings.ruiz_kkt)
    return solve_scaled(sp, settings, x0, y0, warm_x, warm_y)


@functools.partial(jax.jit, static_argnames=("settings", "warm_x", "warm_y"))
def _solve_on_scaled(sp: ScaledProblem, settings: Settings, x0, y0,
                     warm_x: bool, warm_y: bool) -> Result:
    return solve_scaled(sp, settings, x0, y0, warm_x, warm_y)


@functools.partial(jax.jit, static_argnames=("settings", "warm_x", "warm_y"))
def _solve_on_operator(op, settings: Settings, x0, y0,
                       warm_x: bool, warm_y: bool) -> Result:
    return solve_scaled(op, settings, x0, y0, warm_x, warm_y)


def solve_sparse(Q, q, A, l, u, c=0.0,
                 settings: Optional[Settings] = None,
                 x0=None, y0=None, dtype=None) -> Result:
    """Large-n solve with sparse data and matrix-free CG Newton steps.

    Same algorithm and outputs as ``solve`` (one-shot setup + solve,
    qpdo.c:49-476), but Q/A stay in BCOO form and the Newton system is
    solved by Jacobi-preconditioned CG (ops/cg.py) instead of a dense
    Cholesky — the KKT matrix is never materialized, so memory is
    O(nnz + n + m) like the reference's CHOLMOD backend
    (src/cholmod_interface.c:35-52).  Accepts scipy.sparse, BCOO, or dense
    array-likes; ``Q`` must be the full symmetric matrix.
    """
    from .solver.sparse import setup_sparse

    settings = settings or Settings()
    validate_settings(settings)
    t0 = time.perf_counter()
    op = setup_sparse(Q, q, A, l, u, c, settings.scaling, dtype,
                      precond=settings.precond,
                      precond_block=settings.precond_block,
                      ruiz_kkt=settings.ruiz_kkt)
    if x0 is not None:
        x0 = jnp.asarray(x0, op.dtype)
    if y0 is not None:
        y0 = jnp.asarray(y0, op.dtype)
    if _needs_host_driver(settings):
        return solve_driven(op, settings, x0, y0,
                            x0 is not None, y0 is not None, t0)
    return _solve_on_operator(op, settings, x0, y0,
                              x0 is not None, y0 is not None)


def solve_sparse_batch(problems, settings: Optional[Settings] = None,
                       dtype=None, x0=None, y0=None, mesh=None,
                       axis: str = "batch") -> Result:
    """Lock-step batched solve of sparse QPs (sparse MPC fleets / scenario
    sweeps) — the sparse analogue of ``parallel.solve_batch``.

    ``problems`` is a sequence of ``(Q, q, A, l, u[, c])`` tuples of equal
    dimensions.  Instances sharing one nonzero pattern batch directly; when
    patterns differ, every instance is re-expressed on the UNION pattern
    with explicit zeros (``solver.sparse.union_triplets``) — results are
    unchanged, cost scales with nnz(union).  The float leaves of the
    per-instance operators are stacked and the whole solver vmaps over
    them while the index arrays stay shared.  ``x0``/``y0`` (optional,
    (B, n)/(B, m)) warm-start every instance, qpdo.c:217-299 semantics.
    Returns a Result with a leading batch axis.

    ``mesh``: a ``jax.sharding.Mesh`` to shard the batch axis over (the
    sparse analogue of ``parallel.solve_batch_sharded``): stacked float
    leaves are placed with the batch dimension split along ``axis``,
    index arrays replicated, and GSPMD partitions the lock-step solver —
    data-parallel sparse fleets across chips.
    """
    import numpy as np

    from .solver.sparse import _as_triplets, setup_sparse, union_triplets

    settings = settings or Settings()
    validate_settings(settings)
    problems = [tuple(p) for p in problems]  # materialize iterables
    if not problems:
        raise ValueError("solve_sparse_batch: empty problem list")

    # pattern check on the raw triplets (cheap, host-side) BEFORE building
    # any operator, so mixed-pattern fleets don't pay setup twice
    dt = (jnp.float64 if dtype is None and jax.config.jax_enable_x64
          else jnp.dtype(dtype or jnp.zeros(0).dtype))
    q_trips = [_as_triplets(p[0], dt) for p in problems]
    a_trips = [_as_triplets(p[2], dt) for p in problems]

    def same_pattern(trips):
        i0 = np.asarray(trips[0][1])
        return all(t[1].shape == i0.shape and np.array_equal(t[1], i0)
                   for t in trips[1:])

    if not (same_pattern(q_trips) and same_pattern(a_trips)):
        # mixed patterns: re-express every instance on the union pattern
        q_datas, q_idx, q_shape = union_triplets(q_trips, dt)
        a_datas, a_idx, a_shape = union_triplets(a_trips, dt)
        q_trips = [(d, q_idx, q_shape) for d in q_datas]
        a_trips = [(d, a_idx, a_shape) for d in a_datas]

    ops = []
    for p, qt_, at_ in zip(problems, q_trips, a_trips):
        c = p[5] if len(p) > 5 else 0.0
        ops.append(setup_sparse(qt_, p[1], at_, p[3], p[4], c,
                                settings.scaling, dtype,
                                precond=settings.precond,
                                precond_block=settings.precond_block,
                                ruiz_kkt=settings.ruiz_kkt))
    base = ops[0]

    def is_float(x):
        return np.issubdtype(np.asarray(x).dtype, np.floating)

    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs) if is_float(xs[0]) else xs[0], *ops)
    axes = jax.tree.map(lambda x: 0 if is_float(x) else None, base)

    warm_x, warm_y = x0 is not None, y0 is not None
    x0 = None if x0 is None else jnp.asarray(x0, base.dtype)
    y0 = None if y0 is None else jnp.asarray(y0, base.dtype)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def put_batched(x):
            spec = P(axis, *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))

        def put(x):
            # float leaves were batch-stacked (leading B axis) and shard
            # along it; shared index leaves replicate
            if is_float(x):
                return put_batched(jnp.asarray(x))
            return jax.device_put(
                jnp.asarray(x), NamedSharding(mesh, P()))

        stacked = jax.tree.map(put, stacked)
        x0 = put_batched(x0) if warm_x else None
        y0 = put_batched(y0) if warm_y else None

    fn = jax.vmap(
        lambda op, xw, yw: solve_scaled(op, settings, xw, yw,
                                        warm_x, warm_y),
        in_axes=(axes, 0 if warm_x else None, 0 if warm_y else None))
    return jax.jit(fn)(stacked, x0, y0)


def solve_sparse_heterogeneous(problems, settings: Optional[Settings] = None,
                               dtype=None, mesh=None,
                               axis: str = "batch") -> list:
    """Mixed-SIZE sparse fleet: pad every instance to the fleet's max
    (n, m) with inert variables/rows (unit-diagonal Q, all-zero free
    constraint rows — the sparse analogue of utils.padding.pad_problem),
    batch through the union pattern, and return one Result per problem
    sliced back to its original sizes.

    The sparse counterpart of ``utils.padding.solve_heterogeneous``
    (single bucket: one compiled program for the whole fleet; worth it
    when sizes are within ~2x of each other, wasteful beyond that).
    """
    import numpy as np

    from .solver.sparse import pad_sparse_problem
    from .utils.padding import unpad_result

    problems = [tuple(p) for p in problems]
    if not problems:
        raise ValueError("solve_sparse_heterogeneous: empty problem list")
    dims = [(np.asarray(p[1]).reshape(-1).shape[0],
             np.asarray(p[3]).reshape(-1).shape[0]) for p in problems]
    n_pad = max(n for n, _ in dims)
    m_pad = max(m for _, m in dims)
    dt = (jnp.float64 if dtype is None and jax.config.jax_enable_x64
          else jnp.dtype(dtype or jnp.zeros(0).dtype))
    padded = [pad_sparse_problem(p, n_pad, m_pad, dt) for p in problems]
    res = solve_sparse_batch(padded, settings, dtype, mesh=mesh, axis=axis)
    return [unpad_result(jax.tree.map(lambda a, i=i: a[i], res), n, m)
            for i, (n, m) in enumerate(dims)]


def solve(problem: Problem, settings: Optional[Settings] = None,
          x0=None, y0=None) -> Result:
    """One-shot functional solve (setup + optional warm start + solve).

    Equivalent to qpdo_setup + qpdo_warm_start + qpdo_solve
    (qpdo.c:49-476).  Jittable and vmappable via the underlying
    ``_solve_full``; this wrapper adds host-side validation.
    """
    settings = settings or Settings()
    validate_settings(settings)
    validate_data(problem)
    if _needs_host_driver(settings):
        t0 = time.perf_counter()
        sp = _scale_jit(problem, settings.scaling, settings.ruiz_kkt)
        return solve_driven(sp, settings, x0, y0,
                            x0 is not None, y0 is not None, t0)
    return _solve_full(problem, settings, x0, y0,
                       x0 is not None, y0 is not None)


class QPDO:
    """Stateful solver handle, mirroring the MATLAB class
    (interfaces/mex/qpdo.m:1-236): keeps scaled data alive across solves for
    warm starting and MPC-style parametric updates."""

    def __init__(self):
        self._sp: Optional[ScaledProblem] = None
        self._settings = Settings()
        self._x0 = None
        self._y0 = None
        self._setup_time = 0.0
        self._last_x_scaled = None  # for update_q's cost-scalar recomputation

    # -- lifecycle ---------------------------------------------------------

    @staticmethod
    def default_settings() -> Settings:
        return Settings()

    @staticmethod
    def constant(name: str):
        """Solver constants by name (qpdo_mex.c:282-315)."""
        table = {
            "QPDO_INFTY": _c.QPDO_INFTY,
            "QPDO_NAN": float("nan"),
            "QPDO_SOLVED": _c.SOLVED,
            "QPDO_UNSOLVED": _c.UNSOLVED,
            "QPDO_PRIMAL_INFEASIBLE": _c.PRIMAL_INFEASIBLE,
            "QPDO_DUAL_INFEASIBLE": _c.DUAL_INFEASIBLE,
            "QPDO_MAX_ITER_REACHED": _c.MAX_ITER_REACHED,
        }
        if name not in table:
            raise ValueError(f"Constant not recognized: {name}")
        return table[name]

    def setup(self, Q, q, A, l, u, settings: Optional[Settings] = None,
              x0=None, y0=None, c=0.0, dtype=None) -> None:
        """qpdo_setup (qpdo.c:49-212): validate, scale, store."""
        t0 = time.perf_counter()
        self._settings = settings or Settings()
        validate_settings(self._settings)
        problem = make_problem(Q, q, A, l, u, c, dtype)
        validate_data(problem)
        self._sp = _scale_jit(problem, self._settings.scaling,
                              self._settings.ruiz_kkt)
        self._x0, self._y0 = x0, y0
        self._setup_time = time.perf_counter() - t0

    def warm_start(self, x=None, y=None) -> None:
        """qpdo_warm_start (qpdo.c:217-299).  The scaled-state computation is
        fused into the next solve's jitted init; semantics are identical."""
        t0 = time.perf_counter()
        self._x0 = None if x is None else jnp.asarray(x)
        self._y0 = None if y is None else jnp.asarray(y)
        self._setup_time = time.perf_counter() - t0

    def solve(self) -> Result:
        """qpdo_solve (qpdo.c:304-476)."""
        if self._sp is None:
            raise RuntimeError("setup() must be called before solve()")
        t0 = time.perf_counter()
        if _needs_host_driver(self._settings):
            res = solve_driven(self._sp, self._settings, self._x0, self._y0,
                               self._x0 is not None, self._y0 is not None, t0)
        else:
            res = _solve_on_scaled(self._sp, self._settings,
                                   self._x0, self._y0,
                                   self._x0 is not None, self._y0 is not None)
        res = jax.block_until_ready(res)
        solve_time = time.perf_counter() - t0
        # keep the scaled iterate for update_q's cost rescaling (qpdo.c:556-559)
        x_np = np.asarray(res.x)
        if np.all(np.isfinite(x_np)):
            self._last_x_scaled = self._sp.scaling.Dinv * res.x
        # the reference resets `initialized` after each solve (qpdo.c:459):
        # a new warm_start is needed before the next solve
        self._x0 = self._y0 = None
        info = res.info._replace(
            setup_time=jnp.asarray(self._setup_time),
            solve_time=jnp.asarray(solve_time),
            run_time=jnp.asarray(self._setup_time + solve_time))
        return res._replace(info=info)

    # -- parametric updates (MPC workflow) ---------------------------------

    def update_bounds(self, l=None, u=None) -> None:
        """qpdo_update_bounds (qpdo.c:522-544): install new bounds, re-apply
        the stored E scaling in place."""
        sp = self._require_setup()
        d = sp.data
        dt = d.Q.dtype
        inf = _c.QPDO_INFTY
        new_l, new_u = d.l, d.u
        lf, uf = sp.l_finite, sp.u_finite
        if l is not None:
            if np.any(np.isnan(np.asarray(l))):
                raise ValueError("bounds must not contain NaN")
            lr = jnp.clip(jnp.asarray(l, dt).reshape(-1), -inf, inf)
            lf = (lr > -inf).astype(dt)
            new_l = sp.scaling.E * lr
        if u is not None:
            if np.any(np.isnan(np.asarray(u))):
                raise ValueError("bounds must not contain NaN")
            ur = jnp.clip(jnp.asarray(u, dt).reshape(-1), -inf, inf)
            uf = (ur < inf).astype(dt)
            new_u = sp.scaling.E * ur
        if bool(jnp.any(new_l > new_u)):
            raise ValueError("lower bound greater than upper bound")
        self._sp = sp._replace(data=d._replace(l=new_l, u=new_u),
                               l_finite=lf, u_finite=uf)

    def update_q(self, q) -> None:
        """qpdo_update_q (qpdo.c:549-586): install a new linear cost,
        recompute the cost scalar c from the current gradient estimate, and
        rescale Q/q in place."""
        sp = self._require_setup()
        d = sp.data
        sc = sp.scaling
        dt = d.Q.dtype
        q_new = jnp.asarray(q, dt).reshape(-1)
        if self._settings.scaling:
            qD = sc.D * q_new
            # gradient estimate at the last iterate: temp = D q_new + cinv*Qx
            # (qpdo.c:556-560); Qx here is the pure scaled product
            if self._last_x_scaled is not None:
                Qx = d.Q @ self._last_x_scaled
            else:
                Qx = jnp.zeros_like(qD)
            temp = qD + sc.cinv * Qx
            c_new = 1.0 / jnp.maximum(1.0, jnp.max(jnp.abs(temp)))
            ratio = c_new / sc.c
            Q_new = d.Q * ratio
            q_scaled = c_new * qD
            scaling = Scaling(D=sc.D, Dinv=sc.Dinv, E=sc.E, Einv=sc.Einv,
                              c=c_new, cinv=1.0 / c_new)
            norm_q = jnp.max(jnp.abs(sc.Dinv * q_scaled))
            self._sp = sp._replace(
                data=d._replace(Q=Q_new, q=q_scaled),
                scaling=scaling, norm_q=norm_q)
        else:
            self._sp = sp._replace(data=d._replace(q=q_new),
                                   norm_q=jnp.max(jnp.abs(q_new)))

    def update_settings(self, settings: Settings) -> None:
        """qpdo_update_settings (qpdo.c:481-517).  Supports *increasing* the
        number of Ruiz iterations by running the residual passes on the
        already-scaled A and composing the scalings (qpdo.c:496-512)."""
        validate_settings(settings)
        sp = self._require_setup()
        old = self._settings
        if settings.scaling < old.scaling:
            raise ValueError(
                "Decreasing the number of scaling iterations is not allowed")
        if settings.scaling > old.scaling:
            extra = settings.scaling - old.scaling
            d = sp.data
            sc = sp.scaling
            if settings.ruiz_kkt:
                Q2, A2, dD, dE = ruiz_equilibrate_kkt(d.Q, d.A, extra)
            else:
                A2, dD, dE = ruiz_equilibrate(d.A, extra)
                Q2 = d.Q * dD[:, None] * dD[None, :]
            D = sc.D * dD
            E = sc.E * dE
            q2 = d.q * dD
            l2 = dE * d.l
            u2 = dE * d.u
            scaling = Scaling(D=D, Dinv=1.0 / D, E=E, Einv=1.0 / E,
                              c=sc.c, cinv=sc.cinv)
            self._sp = sp._replace(
                data=d._replace(Q=Q2, q=q2, A=A2, l=l2, u=u2),
                scaling=scaling,
                norm_q=jnp.max(jnp.abs(scaling.Dinv * q2)))
        self._settings = settings

    def delete(self) -> None:
        """qpdo_cleanup (qpdo.c:591-689); buffers are GC'd."""
        self._sp = None
        self._x0 = self._y0 = None
        self._last_x_scaled = None

    # -- helpers -----------------------------------------------------------

    def _require_setup(self) -> ScaledProblem:
        if self._sp is None:
            raise RuntimeError("setup() must be called first")
        return self._sp
