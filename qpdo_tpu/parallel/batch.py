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
        sp = scale_problem(p, settings.scaling, settings.ruiz_kkt)
        return solve_scaled(sp, settings, xw, yw, warm_x, warm_y)

    in_axes = (0, 0 if warm_x else None, 0 if warm_y else None)
    return jax.vmap(one, in_axes=in_axes)(problems, x0, y0)


def solve_batch(problems: Problem, settings: Optional[Settings] = None,
                x0=None, y0=None, compact: bool = False) -> Result:
    """Solve a batch of QPs (leading batch axis on every Problem leaf).

    ``compact=True`` enables straggler compaction (see
    ``_solve_batch_compact``): the lock-step loop otherwise runs the whole
    batch until its slowest problem converges."""
    settings = settings or Settings()
    if compact:
        return _solve_batch_compact(problems, settings, x0, y0,
                                    x0 is not None, y0 is not None)
    return _solve_batch(problems, settings, x0, y0,
                        x0 is not None, y0 is not None)


@functools.partial(jax.jit, static_argnames=("settings", "warm_x", "warm_y"))
def _solve_batch_compact(problems: Problem, settings: Settings, x0, y0,
                         warm_x: bool, warm_y: bool) -> Result:
    """Batched solve with straggler compaction.

    The plain lock-step batch pays full-batch cost until the *slowest*
    problem converges.  Here each phase runs full-batch only while more
    than ~1/4 of the problems are active, then repeatedly gathers the
    remaining stragglers into a B/4 sub-batch and finishes them at a
    quarter of the per-iteration cost.  Per-problem *algorithm semantics*
    are unchanged (states are gathered/scattered whole; the step math,
    masks, and caps are identical), and in practice statuses and
    iteration counts match the plain path exactly.  Iterates agree to
    floating-point program variation: a sub-batch is a differently-shaped
    XLA program whose reduction vectorization may round f32 sums a ulp
    differently than the full-batch program."""
    from ..solver import core
    from .. import constants as _c
    import jax.numpy as jnp

    B = problems.q.shape[0]
    K = max(1, B // 4)

    sps = jax.vmap(lambda p: scale_problem(p, settings.scaling, settings.ruiz_kkt))(problems)

    def run_compact(sp_b, stg, state, iter_cap):
        step_v = jax.vmap(lambda sp1, s1: core.step(sp1, stg, s1))
        # mixed-GEMM is a property of THIS phase's state dtype (the f32
        # warmup phase runs its GEMMs in the state dtype already — it must
        # not anchor, matching core.run_loop's `op.dtype` check)
        mixed = (stg.phase2_gemm_dtype is not None
                 and jnp.dtype(stg.phase2_gemm_dtype) != sp_b.data.Q.dtype)

        def active_of(st):
            return (st.status == _c.UNSOLVED) & (st.iter < iter_cap)

        # full-batch phase while enough problems are active; problems at
        # the iteration cap must be frozen explicitly (core.step only
        # freezes status-latched ones) or per-problem iteration counts
        # diverge from the non-compact path when hybrid warmup leaves the
        # batch with skewed iter counters
        def masked_step(st):
            act = active_of(st)
            new = step_v(sp_b, st)
            return jax.tree.map(
                lambda a, b: jnp.where(
                    act.reshape(act.shape + (1,) * (a.ndim - 1)), a, b),
                new, st)

        # any carried KKT cache (incremental K-tilde, or the inv/ns
        # inverse) takes the chunked cadence so the batch-global refresh
        # bounds its staleness — mirrors core.run_loop's check
        incremental = state.kkt_cache is not None
        if mixed or incremental:
            # chunk cadence (core.run_loop does this per problem; here it
            # is batch-global, which bounds drift/staleness identically):
            # mixed-GEMM mode re-anchors the matvec caches (+ rebuilds the
            # incremental-KKT cache); incremental-only mode rebuilds just
            # the KKT cache
            refresh = core.reanchor if mixed else core.rebuild_kkt_cache
            refresh_v = jax.vmap(lambda sp1, s1: refresh(sp1, stg, s1))

            def body1(st):
                st = jax.lax.fori_loop(
                    0, stg.anchor_every, lambda _, t: masked_step(t), st)
                return refresh_v(sp_b, st)
        else:
            body1 = masked_step

        def cond1(st):
            return jnp.sum(active_of(st)) > K
        st = jax.lax.while_loop(cond1, body1, state)

        # compaction rounds: gather <=K stragglers, run them to completion
        run_v = jax.vmap(
            lambda sp1, s1: core.run_loop(sp1, stg, s1, iter_cap))

        def cond2(st):
            return jnp.any(active_of(st))

        def body2(st):
            order = jnp.argsort(~active_of(st))     # actives first, stable
            idx = order[:K]
            sub_sp = jax.tree.map(lambda a: a[idx], sp_b)
            sub = jax.tree.map(lambda a: a[idx], st)
            sub = run_v(sub_sp, sub)
            return jax.tree.map(lambda a, b: a.at[idx].set(b), st, sub)

        return jax.lax.while_loop(cond2, body2, st)

    hybrid = settings.hybrid_warmup and sps.data.Q.dtype != jnp.float32
    if hybrid:
        stg1 = core.warmup_settings(settings)
        sp32 = core.cast_scaled_problem(sps, jnp.float32)
        x032 = None if x0 is None else x0.astype(jnp.float32)
        y032 = None if y0 is None else y0.astype(jnp.float32)
        s = jax.vmap(lambda sp1, xw, yw: core.init_state(
            sp1, stg1, xw, yw, warm_x, warm_y),
            in_axes=(0, 0 if warm_x else None, 0 if warm_y else None))(
                sp32, x032, y032)
        s = run_compact(sp32, stg1, s, core.warmup_iter_cap(settings))
        s = jax.vmap(lambda sp1, s1: core.upcast_state(sp1, settings, s1))(
            sps, s)
        # post-warmup polish (no-op unless settings.polish)
        s = jax.vmap(lambda sp1, s1: core.polish_state(sp1, settings, s1))(
            sps, s)
    else:
        s = jax.vmap(lambda sp1, xw, yw: core.init_state(
            sp1, settings, xw, yw, warm_x, warm_y),
            in_axes=(0, 0 if warm_x else None, 0 if warm_y else None))(
                sps, x0, y0)
        if warm_x and warm_y:
            # warm-start pre-loop polish, matching core.solve_scaled
            s = jax.vmap(lambda sp1, s1: core.polish_state(
                sp1, settings, s1))(sps, s)

    s = run_compact(sps, settings, s, settings.max_iter)
    # final polish (no-op unless settings.polish)
    s = jax.vmap(lambda sp1, s1: core.polish_state(sp1, settings, s1))(sps, s)
    return jax.vmap(lambda sp1, s1: core.finalize(sp1, settings, s1))(sps, s)


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
