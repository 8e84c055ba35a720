"""Utilities: checkpoint round-trip, debug checks, determinism, timers."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

import qpdo_tpu as qt
from qpdo_tpu.parallel import solve_batch
from qpdo_tpu.utils.checkpoint import load_pytree, save_pytree
from qpdo_tpu.utils.debug import check_state_finite, debug_nans
from qpdo_tpu.utils.profiling import PhaseTimer, sync

from utils import random_qp


def test_checkpoint_roundtrip_result():
    Q, q, A, l, u = random_qp(15, 10, seed=0)
    res = qt.solve(qt.make_problem(Q, q, A, l, u))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "res.npz")
        save_pytree(path, res)
        res2 = load_pytree(path, res)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(res2.x))
    assert int(res2.info.status_val) == qt.SOLVED
    # warm-start resume from the checkpoint
    res3 = qt.solve(qt.make_problem(Q, q, A, l, u), x0=res2.x, y0=res2.y)
    assert int(res3.info.iterations) <= int(res.info.iterations)


def test_determinism_across_batch_order():
    """Solving the same problem at different batch positions gives
    bitwise-identical results (lock-step masking must not leak across
    problems)."""
    probs = []
    for seed in range(4):
        Q, q, A, l, u = random_qp(12, 9, seed=seed)
        probs.append(qt.make_problem(Q, q, A, l, u))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
    perm = [2, 0, 3, 1]
    shuffled = jax.tree.map(lambda a: a[jnp.asarray(perm)], stacked)
    r1 = solve_batch(stacked)
    r2 = solve_batch(shuffled)
    for k, orig in enumerate(perm):
        np.testing.assert_array_equal(np.asarray(r2.x[k]),
                                      np.asarray(r1.x[orig]))
        assert int(r2.info.iterations[k]) == int(r1.info.iterations[orig])


def test_repeat_solve_deterministic():
    Q, q, A, l, u = random_qp(20, 15, seed=5)
    p = qt.make_problem(Q, q, A, l, u)
    r1 = qt.solve(p)
    r2 = qt.solve(p)
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))


def test_debug_helpers():
    Q, q, A, l, u = random_qp(10, 8, seed=6)
    res = qt.solve(qt.make_problem(Q, q, A, l, u))
    check_state_finite(res.info)
    with debug_nans(False):
        pass


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    sync(x)
    assert t.times["a"] >= 0
    assert t.counts["a"] == 1


def test_checkpoint_treedef_mismatch_raises():
    """load_pytree must reject a `like` whose structure differs from the
    stored treedef (same leaf count, different field order would silently
    misassign leaves otherwise)."""
    from qpdo_tpu.types import Scaling

    sc = Scaling(D=jnp.ones(3), Dinv=jnp.ones(3), E=jnp.ones(2),
                 Einv=jnp.ones(2), c=jnp.ones(()), cinv=jnp.ones(()))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "sc.npz")
        save_pytree(path, sc)
        # same number of leaves (6), different structure
        like = list(jax.tree.leaves(sc))
        try:
            load_pytree(path, like)
            assert False, "mismatched treedef was accepted"
        except ValueError as e:
            assert "treedef mismatch" in str(e)
        # matching structure loads fine
        sc2 = load_pytree(path, sc)
        np.testing.assert_array_equal(np.asarray(sc2.D), np.asarray(sc.D))
