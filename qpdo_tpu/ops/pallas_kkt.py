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
from .pallas_util import x32_trace_scope


def _take_b3(b):
    """Index map (b, 0, 0) with explicit int32 zeros (Mosaic-safe under
    jax_enable_x64 — see pallas_util.x32_trace_scope)."""
    return (b, jnp.int32(0), jnp.int32(0))


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

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), chol_body,
                      jnp.int32(0))

    # ---- forward: R' z = dinv*rhs  (row-oriented: eliminate with row j) --
    b = rhs_ref[0, 0, :].reshape(1, n) * dinv[None, :]         # (1, n)

    def fwd_body(j, b_):
        rowj = K_ref[pl.ds(j, 1), :]                           # R[j, :]
        diagj = jnp.sum(jnp.where(lane == j, rowj, 0.0))
        zj = jnp.sum(jnp.where(lane == j, b_, 0.0)) / diagj
        # store z_j in slot j; subtract z_j * R[j, k] from future slots k>j
        return jnp.where(lane == j, zj,
                         b_ - zj * jnp.where(lane > j, rowj, 0.0))

    z = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), fwd_body, b)                   # (1, n)

    # ---- backward: R x = z ----
    def bwd_body(k, x):
        j = n - 1 - k
        rowj = K_ref[pl.ds(j, 1), :]
        diagj = jnp.sum(jnp.where(lane == j, rowj, 0.0))
        dotv = jnp.sum(jnp.where(lane > j, rowj * x, 0.0))
        xj = (jnp.sum(jnp.where(lane == j, z, 0.0)) - dotv) / diagj
        return jnp.where(lane == j, xj, x)

    x = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), bwd_body, z)                   # (1, n)
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

    # explicit int32 zeros: under jax_enable_x64 Python-int index-map
    # constants canonicalize to i64, which Mosaic cannot legalize
    take_b = lambda b: (b, jnp.int32(0), jnp.int32(0))
    with x32_trace_scope():
        out = pl.pallas_call(
            _kkt_kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, n, n), take_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m, n), take_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, m), take_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n), take_b, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, n), take_b,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 1, n), f32),
            scratch_shapes=[pltpu.VMEM((n, n), f32)],
            interpret=interpret,
        )(Qs, A, w, rhs)
    return out.reshape(B, n)


@functools.lru_cache(maxsize=None)
def _fused_core(interpret: bool):
    """custom_vmap wrapper for the in-loop fused KKT solve: vmapping
    collapses the mapped axis into the leading batch axis (one
    pallas_call over V*B) instead of pallas_call's generic batching
    rule, which Mosaic fails to legalize on this toolchain
    ("func.return (i32, i64, i64)" — the round-4 finding that killed the
    first formation/residuals A/B; same fix as their _core wrappers)."""

    @jax.custom_batching.custom_vmap
    def f(Q, A, w, sigma, rhs):
        return pallas_kkt_solve(Q, A, w, sigma, rhs, interpret=interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [a if b else
                jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for a, b in zip(args, in_batched)]
        V, B = axis_size, args[0].shape[1]
        flat = [a.reshape((V * B,) + a.shape[2:]) for a in args]
        dx = f(*flat)
        return dx.reshape((V, B) + dx.shape[1:]), True

    return f


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_kkt_solve(Q, A, w, sigma, rhs, interpret: bool = False):
    """In-loop entry: `pallas_kkt_solve` with inert zero-padding to the
    lane multiples the kernel requires (n, m -> multiples of 128) and a
    vmap-collapse rule.

    Padding is inert by construction: padded A rows carry w = 0 (they
    cannot contribute to K), padded Q diagonal entries are 1 (the padded
    block of K is the identity), and the padded rhs lanes are 0, so the
    padded dx lanes solve 1*dx = 0.  Returns dx (B, n) in float32."""
    B, n = rhs.shape
    m = A.shape[1]
    npad = -(-n // 128) * 128
    mpad = -(-m // 128) * 128
    if npad != n or mpad != m:
        Q = jnp.pad(Q, ((0, 0), (0, npad - n), (0, npad - n)))
        if npad != n:  # unit diagonal on the padded block keeps K SPD
            idx = jnp.arange(n, npad, dtype=jnp.int32)
            Q = Q.at[:, idx, idx].set(1.0)
        A = jnp.pad(A, ((0, 0), (0, mpad - m), (0, npad - n)))
        w = jnp.pad(w, ((0, 0), (0, mpad - m)))
        rhs = jnp.pad(rhs, ((0, 0), (0, npad - n)))
    dx = _fused_core(bool(interpret))(Q, A, w, sigma, rhs)
    return dx[:, :n]


# ---------------------------------------------------------------------------
# Batch-in-sublanes stacked Cholesky + solves (round-2 kernel)
# ---------------------------------------------------------------------------

def _stacked_chol_kernel(K_ref, rhs_ref, dx_ref):
    """Cholesky + two substitutions for G problems per program.

    Round-1 measurement (RESULTS.md, logs/tpu_e4.log E3 sweep): the
    row-recursion kernel is *loop-overhead-bound* — time scales with the
    loop count, not the n^3 element work (n 128->256 = 8x FLOPs but only
    1.6x time).  So this kernel stacks G problems on the sublane axis
    ((G*n, n) layout) and factors all G with ONE n-iteration recursion:
    8x fewer loop iterations for the same per-problem element work.

    The per-block trailing update sum_g colv_g (x) row_g is expressed as a
    single (G*n, G) @ (G, n) matmul against a static block one-hot — MXU
    work instead of G serialized outer products.  Column extraction uses a
    lane-mask reduction (Mosaic forbids dynamic lane slicing); row j of
    every block is gathered with G static-offset dynamic sublane slices.
    """
    f32 = jnp.float32
    Gn, n = K_ref.shape[1], K_ref.shape[2]
    G = Gn // n
    tiny = 1e-30

    row2 = jax.lax.broadcasted_iota(jnp.int32, (Gn, n), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (Gn, n), 1)
    rloc = row2 - (row2 // n) * n                    # row index within block
    blk2 = row2 // n                                 # block id per row
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (G, n), 1)

    def gather_rows(j):
        # row j of all G blocks: G static-block dynamic sublane slices
        return jnp.concatenate(
            [K_ref[0, pl.ds(j + g * n, 1), :] for g in range(G)], axis=0)

    def chol_body(j, carry):
        K = K_ref[0]
        rows = gather_rows(j)                                    # (G, n)
        diag = jnp.sum(jnp.where(lane1 == j, rows, 0.0), axis=1,
                       keepdims=True)                            # (G, 1)
        dsafe = jnp.maximum(diag, tiny)
        # column j of each trailing block (= row j there, by symmetry)
        colv = jnp.sum(jnp.where(lane2 == j, K, 0.0), axis=1,
                       keepdims=True)                            # (Gn, 1)
        colv = jnp.where(rloc[:, :1] > j, colv, 0.0)
        rowdiv = jnp.where(lane1 > j, rows / dsafe, 0.0)         # (G, n)
        # Per-block trailing update as G static masked broadcasts.  A
        # single (G*n, G) @ (G, n) matmul against a block one-hot is
        # algebraically identical but runs the MXU at its default bf16
        # pass on TPU (measured rel err 8.6e-4, logs/tpu_e8.log E7) —
        # broadcasts keep the recursion exact in f32.
        upd = jnp.zeros_like(K)
        for g in range(G):
            upd = upd + jnp.where(blk2 == g, colv, 0.0) * rowdiv[g:g + 1, :]
        K_ref[0] = K - upd
        # write the scaled factor rows R[j, :] = row_j / sqrt(d), lanes >= j
        Rrows = jnp.where(lane1 >= j, rows * jax.lax.rsqrt(dsafe), 0.0)
        for g in range(G):
            K_ref[0, pl.ds(j + g * n, 1), :] = Rrows[g:g + 1, :]
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), chol_body,
                      jnp.int32(0))

    # forward substitution  R' z = b   (all G problems as (G, n) lanes)
    def fwd_body(j, b):
        rows = gather_rows(j)
        rjj = jnp.maximum(jnp.sum(jnp.where(lane1 == j, rows, 0.0), axis=1,
                                  keepdims=True), tiny)
        bj = jnp.sum(jnp.where(lane1 == j, b, 0.0), axis=1, keepdims=True)
        zj = bj / rjj
        b = b - zj * jnp.where(lane1 > j, rows, 0.0)
        return jnp.where(lane1 == j, zj, b)

    z = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), fwd_body,
                      rhs_ref[0])

    # back substitution  R x = z
    def bwd_body(t, x):
        j = n - 1 - t
        rows = gather_rows(j)
        rjj = jnp.maximum(jnp.sum(jnp.where(lane1 == j, rows, 0.0), axis=1,
                                  keepdims=True), tiny)
        dotv = jnp.sum(jnp.where(lane1 > j, rows * x, 0.0), axis=1,
                       keepdims=True)
        zj = jnp.sum(jnp.where(lane1 == j, x, 0.0), axis=1, keepdims=True)
        xj = (zj - dotv) / rjj
        return jnp.where(lane1 == j, xj, x)

    dx_ref[0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), bwd_body, z)


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def pallas_chol_solve_stacked(K, rhs, group: int = 8,
                              interpret: bool = False):
    """Batched SPD solve K dx = rhs via the stacked Pallas kernel.

    Args: K (B, n, n) SPD (e.g. the Jacobi-prescaled KKT matrix), rhs
    (B, n).  B must be a multiple of ``group``; n a multiple of 128.
    Formation/Jacobi scaling stay in XLA (they are MXU-friendly there) —
    this kernel owns the part XLA serializes badly: the recursion.
    """
    B, n, _ = K.shape
    G = group
    assert B % G == 0, "batch must be a multiple of the stacking group"
    f32 = jnp.float32
    Ks = K.astype(f32).reshape(B // G, G * n, n)
    rhs_s = rhs.astype(f32).reshape(B // G, G, n)

    with x32_trace_scope():
        out = pl.pallas_call(
            _stacked_chol_kernel,
            grid=(B // G,),
            in_specs=[
                pl.BlockSpec((1, G * n, n), _take_b3,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G, n), _take_b3,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, G, n), _take_b3,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B // G, G, n), f32),
            interpret=interpret,
        )(Ks, rhs_s)
    return out.reshape(B, n)
