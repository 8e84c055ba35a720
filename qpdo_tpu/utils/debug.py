"""Numerical debugging aids — the TPU analogue of a sanitizer layer.

The reference has no sanitizers (single-threaded C); its debug story is
commented-out consistency checks (newton.c:71-90, linesearch.c:53-66).
Here those checks are first-class:

- ``debug_nans()``: context manager enabling jax_debug_nans.
- ``newton_system_residual``: the reference's debug-mode verification of
  the semismooth Newton direction (newton.c:73-89).
- ``linesearch_residual``: psi'(tau) at the returned stepsize
  (linesearch.c:55-65).
- ``check_state_finite``: assert a SolverState has no NaN/Inf.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def newton_system_residual(sp, state, settings, dx, dy, active,
                           res_prim_in, res_dual_in):
    """|| (Q + sigma I) dx + A' dy + res_dual_in ||_inf and the
    complementary primal piece (newton.c:73-89).  Both ~0 for a correct
    Newton direction."""
    d = sp.data
    r1 = d.Q @ dx + d.A.T @ dy + res_dual_in
    if settings.proximal:
        r1 = r1 + state.sigma * dx
    a1 = jnp.max(jnp.abs(r1))
    Adx = d.A @ dx
    r2 = jnp.where(active > 0,
                   res_prim_in - dy * state.mu + Adx,
                   res_prim_in - 0.5 * dy * state.mu)
    a2 = jnp.max(jnp.abs(r2))
    return a1, a2


def linesearch_residual(tau, eta, beta, delta, alpha):
    """psi'(tau)/2 at the returned stepsize (linesearch.c:55-65); ~0."""
    return eta * tau + beta + delta @ jnp.maximum(delta * tau - alpha, 0.0)


def check_state_finite(state) -> None:
    bad = [name for name, v in state._asdict().items()
           if not bool(np.all(np.isfinite(np.asarray(v))))]
    if bad:
        raise FloatingPointError(f"non-finite state fields: {bad}")
