"""Fused KKT-formation Pallas kernel: K = A' diag(w) A + Q + sigma*I.

The last unbuilt SURVEY §7 step-4 kernel.  XLA computes the masked
formation as two ops — an elementwise row-scale producing the (B, m, n)
intermediate ``w ∘ A`` in HBM, then a batched GEMM that reads it back.
This kernel fuses the scale into the GEMM's operand load: one launch per
problem (grid over the batch), the A tile is read once, scaled in VMEM,
and contracted on the MXU; the (B, m, n) intermediate never exists.

Per-problem VMEM at the bench shape (m=150→256, n=100→128, f32):
A 128 KB + scaled copy + Q 64 KB ≈ 0.3 MB — far inside the 16 MB budget.
Measured standalone vs the identical XLA block (scripts/
tpu_pallas_formation_bench.py); integration only where it wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _kernel(A_ref, w_ref, Q_ref, sig_ref, K_ref):
    A = A_ref[0]                    # (mp, np)
    w = w_ref[0]                    # (mp, 1)
    Q = Q_ref[0]                    # (np, np)
    sig = sig_ref[0, 0]
    Aw = A * w                      # fused row scale, VMEM-resident
    K = jax.lax.dot_general(
        A, Aw, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # A' (w ∘ A)
    n = Q.shape[0]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1))
    K_ref[0] = K + Q + jnp.where(eye, sig, 0.0).astype(K.dtype)


def _impl(A, w, Q, sigma, interpret: bool):
    """The pallas_call body (grid over the leading batch axis)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, m, n = A.shape
    dt = A.dtype
    mp = -(-m // 8) * 8
    npad = -(-n // 128) * 128
    A_p = jnp.pad(A, ((0, 0), (0, mp - m), (0, npad - n)))
    w_p = jnp.pad(w, ((0, 0), (0, mp - m)))[..., None]       # (B, mp, 1)
    Q_p = jnp.pad(Q, ((0, 0), (0, npad - n), (0, npad - n)))
    sig = sigma.reshape(B, 1, 1).astype(dt)

    # index-map constants must be explicit int32: under jax_enable_x64 a
    # Python-int 0 canonicalizes to i64 and Mosaic fails to legalize the
    # index-map func.return (i32, i64, i64) — logs/bench_r4h_pallas_both.log
    spec = lambda *blk: pl.BlockSpec(
        blk, lambda b: (b,) + (jnp.int32(0),) * (len(blk) - 1),
        memory_space=pltpu.VMEM)
    from .pallas_util import x32_trace_scope
    with x32_trace_scope(dt):
        K = pl.pallas_call(
            _kernel,
            grid=(B,),
            in_specs=[spec(1, mp, npad), spec(1, mp, 1),
                      spec(1, npad, npad), spec(1, 1, 1)],
            out_specs=spec(1, npad, npad),
            out_shape=jax.ShapeDtypeStruct((B, npad, npad), dt),
            interpret=interpret,
    )(A_p, w_p, Q_p, sig)
    return K[:, :n, :n]


@functools.lru_cache(maxsize=None)
def _core(interpret: bool):
    """custom_vmap wrapper: vmapping COLLAPSES the mapped axis into the
    kernel's existing leading batch axis (one pallas_call over V*B) instead
    of engaging pallas_call's generic batching rule, which appends a grid
    dimension Mosaic fails to legalize on this toolchain ("func.return
    (i32, i64, i64)" — logs/bench_r4_pallas_*.log).  The in-loop call sites
    run per-problem (B=1) inside a vmapped solve, so this rule is what the
    bench actually exercises."""

    @jax.custom_batching.custom_vmap
    def f(A, w, Q, sigma):
        return _impl(A, w, Q, sigma, interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [a if b else
                jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for a, b in zip(args, in_batched)]
        V, B = axis_size, args[0].shape[1]
        flat = [a.reshape((V * B,) + a.shape[2:]) for a in args]
        K = f(*flat)  # re-entrant: nested vmaps collapse level by level
        return K.reshape((V, B) + K.shape[1:]), True

    return f


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_formation(A, w, Q, sigma, interpret: bool = False):
    """K = A' diag(w) A + Q + sigma*I, batched.  A (B, m, n), w (B, m),
    Q (B, n, n), sigma (B,).  Zero-pads m/n to multiples of 128/8 (padded
    w lanes are zero, so padding cannot contribute).  vmap-safe: batching
    collapses into the leading axis (see _core)."""
    return _core(bool(interpret))(A, w, Q, sigma)


def reference_formation(A, w, Q, sigma):
    """The XLA baseline: explicit row scale + batched GEMM (what
    ops/linalg.form_kkt does today)."""
    Aw = A * w[..., None]
    return (jnp.einsum("bmi,bmj->bij", A, Aw) + Q
            + sigma[:, None, None]
            * jnp.eye(A.shape[-1], dtype=A.dtype)[None])
