"""Sequential Quadratic Programming on top of the QP solver.

Solves smooth nonlinear programs   min f(x)  s.t.  l <= c(x) <= u
by the classic SQP recipe: at each iterate linearize c, build a convex
QP over the step d with a damped-BFGS Hessian estimate and a trust-region
box, solve it with qpdo_tpu (warm-started from the previous multipliers),
and globalize with an l1-merit backtracking linesearch.  Derivatives come
from jax.grad / jax.jacfwd — no hand-written gradients.

This is a demo of what the framework's pieces compose into (autodiff +
fast warm-started re-solves), not a hardened NLP solver.  The reference
has no NLP layer; its closest workflow is the parametric MPC re-solve
(examples/demo_mex.m:45-56).

Run: python examples/sqp.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

import qpdo_tpu as qt  # noqa: E402


from qpdo_tpu.applications import sqp_minimize  # noqa: E402


def main():
    # 1) Rosenbrock constrained to the unit disk:
    #    min (1-x)^2 + 100(y-x^2)^2   s.t.  x^2 + y^2 <= 1
    #    known optimum ~ (0.7864, 0.6177)
    f = lambda z: (1 - z[0]) ** 2 + 100.0 * (z[1] - z[0] ** 2) ** 2
    c = lambda z: jnp.array([z[0] ** 2 + z[1] ** 2])
    x, its = sqp_minimize(f, c, [0.0, 0.0], [-jnp.inf], [1.0])
    print(f"rosenbrock-disk: x = ({x[0]:.4f}, {x[1]:.4f}) in {its} SQP its "
          f"(expected ~(0.7864, 0.6177))")
    assert abs(x[0] - 0.7864) < 1e-3 and abs(x[1] - 0.6177) < 1e-3

    # 2) HS6-like equality problem: min (1-x)^2  s.t. 10(y - x^2) = 0
    f2 = lambda z: (1 - z[0]) ** 2
    c2 = lambda z: jnp.array([10.0 * (z[1] - z[0] ** 2)])
    x, its = sqp_minimize(f2, c2, [-1.2, 1.0], [0.0], [0.0])
    print(f"hs6:             x = ({x[0]:.4f}, {x[1]:.4f}) in {its} SQP its "
          f"(expected (1, 1))")
    assert abs(x[0] - 1.0) < 1e-5 and abs(x[1] - 1.0) < 1e-5

    # 3) entropy-like objective with a simplex constraint
    f3 = lambda z: jnp.sum(z * jnp.log(jnp.maximum(z, 1e-12))) + z @ jnp.arange(4.0)
    c3 = lambda z: jnp.concatenate([jnp.sum(z)[None], z])
    lo = jnp.concatenate([jnp.ones(1), jnp.zeros(4)])
    hi = jnp.concatenate([jnp.ones(1), jnp.full(4, jnp.inf)])
    x, its = sqp_minimize(f3, c3, jnp.full(4, 0.25), lo, hi)
    ref = np.exp(-np.arange(4.0)); ref /= ref.sum()  # softmax(-cost)
    print(f"entropy-simplex: x = {np.round(x, 4)} in {its} SQP its "
          f"(expected softmax {np.round(ref, 4)})")
    assert np.max(np.abs(x - ref)) < 1e-4


if __name__ == "__main__":
    main()
