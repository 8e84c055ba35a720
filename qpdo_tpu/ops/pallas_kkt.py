"""Fused Pallas TPU kernel for the batched Newton KKT solve.

One kernel invocation per problem does, entirely in VMEM with no HBM
round-trips between stages (the XLA path runs ~6 separate ops with
intermediate HBM traffic):

    K    = Qs + A' diag(w) A          (MXU matmul; Qs = Q + sigma*I)
    Khat = D^-1 K D^-1 + reg*I        (Jacobi pre-scaling)
    L    = chol(Khat)                 (in-place right-looking, masked
                                       rank-1 updates, fori_loop)
    dx   = D^-1 L^-T L^-1 D^-1 rhs    (forward/back substitution)

Requires lane-aligned shapes: n and m multiples of 128 (pad problems with
utils/padding.py — padding is inert).  Numerics match the XLA path to
float32 roundoff (tests/test_pallas_kkt.py validates in interpret mode).

Environment caveat: on the axon platform a kernel compile takes ~10
minutes (RESULTS.md), so the kernel is opt-in rather than the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .linalg import _static_reg


def _kkt_kernel(Qs_ref, A_ref, w_ref, rhs_ref, dx_ref, K_ref):
    """Fused KKT solve for one problem; all refs in VMEM.

    Block shapes: Qs (1,n,n), A (1,m,n), w (1,1,m), rhs (1,1,n),
    dx out (1,1,n), K scratch (n,n).

    Everything is ROW-oriented: Mosaic only allows dynamic slicing on the
    sublane (first) dimension, so the factorization computes the upper
    factor R = L' row by row (K is symmetric, so row j of K is column j),
    and both substitutions access R by rows only."""
    n = K_ref.shape[0]
    f32 = jnp.float32

    # ---- K = Qs + A' (w o A) ----
    A = A_ref[0]
    wA = w_ref[0, 0, :][:, None] * A                           # (m, n)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (row == col).astype(f32)
    K = jnp.dot(A.T, wA, preferred_element_type=f32) + Qs_ref[0]

    # ---- Jacobi scale + static regularization ----
    diag = jnp.sum(K * eye, axis=1)                            # (n,)
    # mirror the XLA path's semantics (ops/linalg.py jacobi_cholesky):
    # leave non-positive diagonal rows unscaled instead of amplifying
    # them by rsqrt(1e-30)
    dinv = jnp.where(diag > 0.0,
                     jax.lax.rsqrt(jnp.where(diag > 0.0, diag, 1.0)), 1.0)
    K_ref[:] = (K * dinv[:, None] * dinv[None, :]
                + _static_reg(f32) * eye)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)      # (1, n)

    # ---- in-place right-looking Cholesky: upper factor R, row at a time --
    def chol_body(j, carry):
        rowj = K_ref[pl.ds(j, 1), :]                           # (1, n)
        dj = jnp.sum(jnp.where(lane == j, rowj, 0.0))
        inv_sqrt = jax.lax.rsqrt(jnp.maximum(dj, 1e-30))
        Rrow = jnp.where(lane >= j, rowj * inv_sqrt, 0.0)      # (1, n)
        K_ref[pl.ds(j, 1), :] = Rrow
        # trailing update: K[j+1:, j+1:] -= Rrow' Rrow (rows/cols > j)
        tail = jnp.where(lane > j, Rrow, 0.0)                  # (1, n)
        upd = tail[0, :][:, None] * tail                       # (n, n)
        K_ref[:] = K_ref[:] - jnp.where(row > j, upd, 0.0)
        return carry

    jax.lax.fori_loop(0, n, chol_body, 0)

    # ---- forward: R' z = dinv*rhs  (row-oriented: eliminate with row j) --
    b = rhs_ref[0, 0, :].reshape(1, n) * dinv[None, :]         # (1, n)

    def fwd_body(j, b_):
        rowj = K_ref[pl.ds(j, 1), :]                           # R[j, :]
        diagj = jnp.sum(jnp.where(lane == j, rowj, 0.0))
        zj = jnp.sum(jnp.where(lane == j, b_, 0.0)) / diagj
        # store z_j in slot j; subtract z_j * R[j, k] from future slots k>j
        return jnp.where(lane == j, zj,
                         b_ - zj * jnp.where(lane > j, rowj, 0.0))

    z = jax.lax.fori_loop(0, n, fwd_body, b)                   # (1, n)

    # ---- backward: R x = z ----
    def bwd_body(k, x):
        j = n - 1 - k
        rowj = K_ref[pl.ds(j, 1), :]
        diagj = jnp.sum(jnp.where(lane == j, rowj, 0.0))
        dotv = jnp.sum(jnp.where(lane > j, rowj * x, 0.0))
        xj = (jnp.sum(jnp.where(lane == j, z, 0.0)) - dotv) / diagj
        return jnp.where(lane == j, xj, x)

    x = jax.lax.fori_loop(0, n, bwd_body, z)                   # (1, n)
    dx_ref[0, 0, :] = (x * dinv[None, :])[0, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_kkt_solve(Q, A, w, sigma, rhs, interpret: bool = False):
    """Batched fused KKT solve.

    Args: Q (B,n,n), A (B,m,n), w (B,m) [= active/mu], sigma (B,),
    rhs (B,n).  Returns dx (B,n) with K dx = rhs,
    K = Q + sigma*I + A'diag(w)A.  n, m must be multiples of 128."""
    B, n, _ = Q.shape
    m = A.shape[1]
    f32 = jnp.float32
    eye = jnp.eye(n, dtype=f32)
    Qs = Q.astype(f32) + sigma.astype(f32)[:, None, None] * eye
    A = A.astype(f32)
    w = w.astype(f32).reshape(B, 1, m)
    rhs = rhs.astype(f32).reshape(B, 1, n)

    take_b = lambda b: (b, 0, 0)
    out = pl.pallas_call(
        _kkt_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, n), take_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, n), take_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), take_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), take_b, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n), take_b, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, n), f32),
        scratch_shapes=[pltpu.VMEM((n, n), f32)],
        interpret=interpret,
    )(Qs, A, w, rhs)
    return out.reshape(B, n)
