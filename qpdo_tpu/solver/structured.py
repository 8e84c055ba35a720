"""Block-angular (scenario-structured) QPDO solver.

Tensor-parallel scale-out for structured QPs (SURVEY.md §2.4/§5): problems

    minimize   0.5 x0'Q0 x0 + sum_s 0.5 xs'Qs xs + q0'x0 + sum_s qs'xs
    subject to l_s <= T_s x0 + W_s x_s <= u_s        s = 1..S

(two-stage stochastic programs, scenario MPC).  The semismooth Newton KKT
matrix is exactly arrow-structured, so every Newton solve is a distributed
Schur complement (BlockAngularOperator.newton_solve; standalone algebra in
ops/schur.py).  Placing an S-sharded ``jax.sharding.NamedSharding`` on the
problem leaves makes XLA insert the psum/all-gather collectives — one
all-reduce per Newton iteration rides the ICI.

v2: the step logic is the *generic core* (solver/core.py, which cites the
reference line-by-line) running on a ``BlockAngularOperator`` — the same
code path as the dense and sparse solvers, so the structured path now has
Ruiz equilibration (scale_block_angular below, semantics of
src/scaling.c:24-91 on the block form) and primal/dual infeasibility
certificates (src/termination.c:97-216), and batching over instances is
plain ``vmap``.  Semantic parity with the dense solver is pinned by
tests/test_structured.py::test_matches_dense.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import constants as _c
from ..operators import BlockAngularOperator
from ..types import Result, Settings
from .core import solve_scaled
from .scaling import limit_scaling


class BlockAngularProblem(NamedTuple):
    Q0: jax.Array   # (n0, n0)
    Qs: jax.Array   # (S, ns, ns)
    q0: jax.Array   # (n0,)
    qs: jax.Array   # (S, ns)
    T: jax.Array    # (S, ms, n0)
    W: jax.Array    # (S, ms, ns)
    l: jax.Array    # (S, ms)
    u: jax.Array    # (S, ms)
    c: jax.Array    # scalar

    @property
    def shapes(self):
        S, ms, n0 = self.T.shape
        ns = self.W.shape[-1]
        return S, ms, n0, ns


def scale_block_angular(p: BlockAngularProblem,
                        scaling_iters: int) -> BlockAngularOperator:
    """Ruiz equilibration + cost scaling on the block-angular form.

    Same semantics as the dense scale_problem (src/scaling.c:24-91):
    ``scaling_iters`` passes on A = [T W] only — column norms of the x0
    block reduce over all scenarios, column norms of the xs blocks are
    scenario-local, row norms combine both blocks — then Q <- c D Q D,
    q <- c D q with c = 1/max(1, ||D q||_inf), bounds <- E l/u.
    """
    dt = p.Q0.dtype
    S, ms, n0 = p.T.shape
    ns = p.W.shape[-1]
    one = jnp.asarray(1.0, dt)
    inf = jnp.asarray(_c.QPDO_INFTY, dt)
    l = jnp.clip(p.l.astype(dt), -inf, inf)
    u = jnp.clip(p.u.astype(dt), -inf, inf)
    l_finite = (l > -inf).astype(dt)
    u_finite = (u < inf).astype(dt)

    if scaling_iters == 0:
        D0, Ds = jnp.ones((n0,), dt), jnp.ones((S, ns), dt)
        E = jnp.ones((S, ms), dt)
        cost = one
        T, W, Q0, Qs, q0, qs = p.T, p.W, p.Q0, p.Qs, p.q0, p.qs
    else:
        def body(_, carry):
            T, W, D0, Ds, E = carry
            c0 = jnp.max(jnp.abs(T), axis=(0, 1))          # (n0,)
            cs = jnp.max(jnp.abs(W), axis=1)               # (S, ns)
            rn = jnp.maximum(jnp.max(jnp.abs(T), axis=2),
                             jnp.max(jnp.abs(W), axis=2))  # (S, ms)
            d0 = jax.lax.rsqrt(limit_scaling(c0))
            ds = jax.lax.rsqrt(limit_scaling(cs))
            e = jax.lax.rsqrt(limit_scaling(rn))
            T = e[..., None] * T * d0[None, None, :]
            W = e[..., None] * W * ds[:, None, :]
            return T, W, D0 * d0, Ds * ds, E * e

        T, W, D0, Ds, E = jax.lax.fori_loop(
            0, scaling_iters, body,
            (p.T.astype(dt), p.W.astype(dt),
             jnp.ones((n0,), dt), jnp.ones((S, ns), dt),
             jnp.ones((S, ms), dt)))
        q0 = p.q0 * D0
        qs = p.qs * Ds
        cost = one / jnp.maximum(one, jnp.maximum(
            jnp.max(jnp.abs(q0)), jnp.max(jnp.abs(qs))))
        q0, qs = cost * q0, cost * qs
        Q0 = cost * (p.Q0 * D0[:, None] * D0[None, :])
        Qs = cost * (p.Qs * Ds[:, :, None] * Ds[:, None, :])
        l, u = E * l, E * u

    return BlockAngularOperator(
        Q0=Q0, Qs=Qs, T=T, W=W, q=(q0, qs), l=l, u=u,
        c=jnp.asarray(p.c, dt), D=(D0, Ds),
        Dinv=(one / D0, one / Ds), E=E, Einv=one / E,
        cost=cost, cinv=one / cost, l_finite=l_finite, u_finite=u_finite)


def solve_block_angular_result(p: BlockAngularProblem,
                               settings: Optional[Settings] = None,
                               warm=None) -> Result:
    """Full structured solve via the generic core; returns the complete
    ``Result`` (x as an (x0, xs) tuple, dual y as (S, ms), infeasibility
    certificates NaN-filled by status per the MEX contract).  Shard the S
    axis of the problem leaves over a mesh to distribute."""
    settings = settings or Settings()
    with jax.default_matmul_precision(settings.matmul_precision):
        op = scale_block_angular(p, settings.scaling)
    if warm is not None:
        x0w = (warm[0], warm[1])
        y0w = warm[2]
    else:
        x0w = y0w = None
    return solve_scaled(op, settings, x0w, y0w,
                        warm is not None, warm is not None)


def solve_block_angular(p: BlockAngularProblem,
                        settings: Optional[Settings] = None, warm=None):
    """Compatibility wrapper returning (x0, xs, y, Info)."""
    res = solve_block_angular_result(p, settings, warm)
    x0, xs = res.x
    return x0, xs, res.y, res.info


def to_dense_problem(p: BlockAngularProblem):
    """Assemble the equivalent dense Problem (test utility)."""
    from ..types import Problem

    S, ms, n0, ns = p.shapes
    n = n0 + S * ns
    m = S * ms
    dt = p.Q0.dtype
    Q = jnp.zeros((n, n), dt).at[:n0, :n0].set(p.Q0)
    A = jnp.zeros((m, n), dt)
    q = jnp.zeros((n,), dt).at[:n0].set(p.q0)
    for s in range(S):
        lo = n0 + s * ns
        Q = Q.at[lo:lo + ns, lo:lo + ns].set(p.Qs[s])
        q = q.at[lo:lo + ns].set(p.qs[s])
        rlo = s * ms
        A = A.at[rlo:rlo + ms, :n0].set(p.T[s])
        A = A.at[rlo:rlo + ms, lo:lo + ns].set(p.W[s])
    return Problem(Q=Q, q=q, A=A, l=p.l.ravel(), u=p.u.ravel(), c=p.c)
