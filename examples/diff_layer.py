"""Differentiable QP layer: gradient descent straight through the solver.

No reference counterpart (the C solver is not differentiable).  The task:
a learned projection layer.  ``project(p)`` = the Euclidean projection of a
point ``p`` onto the polytope {x : l <= Ax <= u} — itself a QP
(Q = I, q = -p) — and we recover a point whose projection hits an observed
target x_star = project(p_true) by descending

    L(p) = || project(p) - x_star ||^2

with gradients flowing through ``qpdo_tpu.qp_solve`` (implicit
differentiation; one adjoint KKT solve per backward pass).  The target sits
on the *boundary* (several constraints active), so the gradient genuinely
exercises the active-set-aware adjoint, not just the unconstrained case.

A caveat worth knowing: inverse problems over the QP's *cost* (recover q
from x(q)) are only locally well-posed — wherever constraints fully pin the
solution, dx/dq = 0 and gradient methods stall on plateaus.  That is a
property of the solution map itself, not of the gradients (which are exact;
see tests/test_diff.py).

Run:  python examples/diff_layer.py   (CPU, float64)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import qpdo_tpu as qt  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    n, m = 10, 15

    Q = jnp.eye(n)
    A = jnp.asarray(rng.standard_normal((m, n)))
    l = jnp.asarray(-1.0 - rng.random(m))
    u = jnp.asarray(1.0 + rng.random(m))
    settings = qt.Settings(eps_abs=1e-9)

    def project(p):
        x, _ = qt.qp_solve(Q, -p, A, l, u, settings)
        return x

    # the observation: the projection of a hidden exterior point
    p_true = 3.0 * jnp.asarray(rng.standard_normal(n))
    x_star = project(p_true)
    n_active = int(((A @ x_star - l < 1e-7) | (u - A @ x_star < 1e-7)).sum())
    print(f"target has {n_active}/{m} active constraints")

    @jax.jit
    def loss_and_grad(p):
        return jax.value_and_grad(
            lambda p: jnp.sum((project(p) - x_star) ** 2))(p)

    p = jnp.zeros(n)
    print("step   loss")
    for k in range(80):
        val, g = loss_and_grad(p)
        if k % 20 == 0:
            print(f"{k:4d}   {float(val):.3e}")
        p = p - 0.5 * g
    val, _ = loss_and_grad(p)
    print(f"final  {float(val):.3e}")
    assert float(val) < 1e-12, "gradient descent through the solver failed"
    print("recovered a point whose projection reproduces the target")


if __name__ == "__main__":
    main()
