"""bench.py accounting hardening (round-2 verdict items):

- the chip flock is a real mutual-exclusion token (two lock-aware
  processes can never co-run on the crash-prone axon chip);
- the analytic per-iteration FLOP model is cross-checked against XLA's
  own cost analysis of the compiled step program — the MFU numerator is
  a validated measurement model, not an unverified formula;
- Info.warmup_iterations (the per-phase split feeding bench.py's FLOP
  accounting) reports the float32 phase-1 iteration count.
"""

import os
import sys

import jax
import numpy as np

import qpdo_tpu as qt
from qpdo_tpu.solver import core
from qpdo_tpu.solver.scaling import scale_problem

from utils import random_qp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (repo-root module)


def test_chip_lock_mutual_exclusion(tmp_path):
    p = str(tmp_path / "chip.lock")
    fh1 = bench.acquire_chip_lock(max_wait_s=0.0, lock_path=p)
    assert fh1 is not None
    # a second would-be holder cannot acquire while fh1 is held (flock
    # treats separate open file descriptions independently, so this
    # exercises the real kernel lock, not a same-fd no-op)
    assert bench.acquire_chip_lock(max_wait_s=0.0, lock_path=p) is None
    fh1.close()  # the kernel releases on close/exit/crash
    fh2 = bench.acquire_chip_lock(max_wait_s=0.0, lock_path=p)
    assert fh2 is not None
    fh2.close()


def test_flops_model_vs_xla_cost_analysis():
    """One dense Newton step, compiled: XLA's counted FLOPs must agree
    with bench.flops_per_iteration.  XLA does not count custom-call work
    (Cholesky / triangular solves, ~10% of the model here), so agreement
    within 30% validates the dominant GEMM terms.  Measured ratio on
    XLA-CPU at (n=100, m=150, refine_steps=2): 0.973."""
    n, m = 100, 150
    Q, q, A, l, u = random_qp(n, m, seed=7)
    problem = qt.make_problem(Q, q, A, l, u)
    settings = qt.Settings(refine_steps=2)
    sp = scale_problem(problem, settings.scaling, settings.ruiz_kkt)
    op = core.as_operator(sp)
    s0 = core.init_state(op, settings, None, None, False, False)
    compiled = jax.jit(lambda st: core.step(op, settings, st)).lower(
        s0).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns a per-device list
        ca = ca[0]
    xla_flops = float(ca.get("flops", 0.0))
    assert xla_flops > 0.0
    model = bench.flops_per_iteration(n, m, settings.refine_steps)
    assert 0.7 < xla_flops / model < 1.3


def test_warmup_iterations_split():
    Q, q, A, l, u = random_qp(60, 40, seed=11)
    problem = qt.make_problem(Q, q, A, l, u)
    # hybrid on: warmup_iterations must be a nonzero strict subset
    res = qt.solve(problem, qt.Settings(hybrid_warmup=True, mu_min=1e-7))
    assert int(res.info.status_val) == qt.SOLVED
    wi, ti = int(res.info.warmup_iterations), int(res.info.iterations)
    assert 0 < wi <= ti
    # hybrid off: the split reports zero warmup iterations
    res0 = qt.solve(problem, qt.Settings())
    assert int(res0.info.warmup_iterations) == 0
    assert int(res0.info.iterations) > 0


def test_flops_model_ns_vs_xla_cost_analysis():
    """The ns-mode per-iteration FLOP formula (the round-5 bench
    default's MFU numerator) against XLA's own cost analysis of the
    compiled step.  XLA does not count the (absent) factorization;
    the ns GEMM mix is fully counted, so agreement should be tight."""
    n, m = 100, 150
    Q, q, A, l, u = random_qp(n, m, seed=9)
    problem = qt.make_problem(Q, q, A, l, u)
    settings = qt.Settings(kkt_solver="ns", kkt_ns_steps=5,
                           kkt_inv_refresh=False, refine_steps=2)
    sp = scale_problem(problem, settings.scaling, settings.ruiz_kkt)
    op = core.as_operator(sp)
    s0 = core.init_state(op, settings, None, None, False, False)
    compiled = jax.jit(lambda st: core.step(op, settings, st)).lower(
        s0).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    xla_flops = float(ca.get("flops", 0.0))
    assert xla_flops > 0.0
    import bench
    model = bench.flops_per_iteration(
        n, m, settings.refine_steps, kkt_solver="ns",
        kkt_ns_steps=settings.kkt_ns_steps, kkt_inv_refresh=False)
    assert 0.7 < xla_flops / model < 1.3, xla_flops / model
