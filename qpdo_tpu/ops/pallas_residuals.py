"""Fused residual+norm Pallas kernel (SURVEY §7 step 4's last entry).

One TPU kernel computes the whole per-iteration residual block of
solver/core.py step() for a *batch* of problems — outer primal residual,
inner primal/dual residuals, the w test point, the active weights, and
the four infinity norms — in VMEM, replacing ~15 XLA elementwise
fusions + 4 reductions per iteration with a single launch:

    res_prim    = Ax - clip(Ax + (E*E*cinv) y, l, u)          (outer)
    w           = Ax + mu (ybar - y/2)
    res_prim_in = Ax + mu (ybar - y) - clip(w, l, u)           (inner)
    df          = Qx + q + sigma (x - xbar)                    (proximal)
    res_dual_in = df + Aty
    active      = (w <= l) | (w >= u)
    rp  = ||Einv * res_prim||_inf        rpi = ||Einv * res_prim_in||_inf
    rd  = ||Dinv * (Qx + q + Aty)||_inf * cinv
    rdi = ||Dinv * res_dual_in||_inf * cinv

Dual-side arrays are (B, m), primal-side (B, n), per-problem scalars
(B,); m and n are zero-padded to lane multiples of 128 by the wrapper
(padded lanes carry Einv = Dinv = 0, so they cannot contribute to the
norms; padded ``active``/``w`` lanes are don't-cares).

Measured protocol (RESULTS.md): standalone vs the identical XLA-compiled
jnp block — integration is only warranted where the kernel wins.  On the
2026-08-19 axon chip state the binding cost is GEMM-sized MXU ops
(kktrows/bisect_chunk equal-wall evidence), so this kernel is expected
neutral there; it exists to settle the round-2 "never tried" item by
measurement and as the integration candidate for launch-bound parts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pad_to(x, lanes):
    pad = lanes - x.shape[-1]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad)))


def _kernel(Ax, y, mu, ybar, l, u, E, Einv,           # (B, mp) dual side
            Qx, q, Aty, x, xbar, Dinv,                # (B, np) primal side
            sigma, cinv,                              # (B, 1) scalars
            res_prim, res_prim_in, w_out, active,     # (B, mp) outs
            res_dual_in,                              # (B, np) out
            norms):                                   # (B, 4) out
    ax = Ax[:]
    yv = y[:]
    muv = mu[:]
    yb = ybar[:]
    lv = l[:]
    uv = u[:]
    Ev = E[:]
    Eiv = Einv[:]
    sig = sigma[:]          # (B, 1) broadcasts over lanes
    civ = cinv[:]

    rp = ax - jnp.clip(ax + (Ev * Ev * civ) * yv, lv, uv)
    wv = ax + muv * (yb - 0.5 * yv)
    rpi = ax + muv * (yb - yv) - jnp.clip(wv, lv, uv)
    act = ((wv <= lv) | (wv >= uv)).astype(ax.dtype)
    res_prim[:] = rp
    res_prim_in[:] = rpi
    w_out[:] = wv
    active[:] = act

    qx = Qx[:]
    qv = q[:]
    aty = Aty[:]
    xv = x[:]
    xb = xbar[:]
    Div = Dinv[:]
    df = qx + qv + sig * (xv - xb)
    rdi_vec = df + aty
    res_dual_in[:] = rdi_vec

    rp_n = jnp.max(jnp.abs(Eiv * rp), axis=1, keepdims=True)
    rpi_n = jnp.max(jnp.abs(Eiv * rpi), axis=1, keepdims=True)
    rd_n = jnp.max(jnp.abs(Div * (qx + qv + aty)), axis=1,
                   keepdims=True) * civ
    rdi_n = jnp.max(jnp.abs(Div * rdi_vec), axis=1, keepdims=True) * civ
    norms[:] = jnp.concatenate([rp_n, rd_n, rpi_n, rdi_n], axis=1)


def _impl(Ax, y, mu, ybar, l, u, E, Einv,
          Qx, q, Aty, x, xbar, Dinv,
          sigma, cinv, interpret: bool):
    """The pallas_call body (single block over the batch)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, m = Ax.shape
    n = Qx.shape[1]
    dt = Ax.dtype
    mp = -(-m // 128) * 128
    npad = -(-n // 128) * 128

    duals = [_pad_to(a, mp) for a in (Ax, y, mu, ybar, l, u, E, Einv)]
    prims = [_pad_to(a, npad) for a in (Qx, q, Aty, x, xbar, Dinv)]
    scal = [sigma.reshape(B, 1).astype(dt), cinv.reshape(B, 1).astype(dt)]

    from .pallas_util import x32_trace_scope
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    with x32_trace_scope(dt):
        outs = pl.pallas_call(
        _kernel,
            out_shape=(
                jax.ShapeDtypeStruct((B, mp), dt),   # res_prim
                jax.ShapeDtypeStruct((B, mp), dt),   # res_prim_in
                jax.ShapeDtypeStruct((B, mp), dt),   # w
                jax.ShapeDtypeStruct((B, mp), dt),   # active
                jax.ShapeDtypeStruct((B, npad), dt),  # res_dual_in
                jax.ShapeDtypeStruct((B, 4), dt),    # norms
            ),
            in_specs=[vspec] * 16,
            out_specs=(vspec,) * 6,
            interpret=interpret,
        )(*duals, *prims, *scal)
    res_prim, res_prim_in, w, active, res_dual_in, norms = outs
    return (res_prim[:, :m], res_prim_in[:, :m], w[:, :m], active[:, :m],
            res_dual_in[:, :n],
            norms[:, 0], norms[:, 1], norms[:, 2], norms[:, 3])


@functools.lru_cache(maxsize=None)
def _core(interpret: bool):
    """custom_vmap wrapper: vmapping collapses the mapped axis into the
    kernel's existing leading batch axis — ONE pallas_call over V*B rows —
    instead of pallas_call's generic batching rule, which Mosaic fails to
    legalize on this toolchain ("func.return (i32, i64, i64)",
    logs/bench_r4_pallas_*.log).  The in-loop site runs per-problem (B=1)
    inside the bench's vmapped solve, so this rule is the hot path."""

    @jax.custom_batching.custom_vmap
    def f(*args):
        return _impl(*args, interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [a if b else
                jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for a, b in zip(args, in_batched)]
        V, B = axis_size, args[0].shape[1]
        flat = [a.reshape((V * B,) + a.shape[2:]) for a in args]
        outs = f(*flat)  # re-entrant: nested vmaps collapse level by level
        outs = tuple(o.reshape((V, B) + o.shape[1:]) for o in outs)
        return outs, tuple(True for _ in outs)

    return f


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_residuals(Ax, y, mu, ybar, l, u, E, Einv,
                    Qx, q, Aty, x, xbar, Dinv,
                    sigma, cinv, interpret: bool = False):
    """Batched fused residual block.  All dual args (B, m), primal (B, n),
    sigma/cinv (B,).  Returns (res_prim, res_prim_in, w, active,
    res_dual_in, rp, rd, rpi, rdi) with the vector outputs sliced back to
    the unpadded widths and the norms shaped (B,).  vmap-safe: batching
    collapses into the leading axis (see _core)."""
    return _core(bool(interpret))(Ax, y, mu, ybar, l, u, E, Einv,
                                  Qx, q, Aty, x, xbar, Dinv, sigma, cinv)


def reference_residuals(Ax, y, mu, ybar, l, u, E, Einv,
                        Qx, q, Aty, x, xbar, Dinv, sigma, cinv):
    """The identical block as plain jnp (what XLA fuses today) — the
    correctness oracle and the microbenchmark baseline."""
    sig = sigma[:, None]
    civ = cinv[:, None]
    rp = Ax - jnp.clip(Ax + (E * E * civ) * y, l, u)
    w = Ax + mu * (ybar - 0.5 * y)
    rpi = Ax + mu * (ybar - y) - jnp.clip(w, l, u)
    active = ((w <= l) | (w >= u)).astype(Ax.dtype)
    df = Qx + q + sig * (x - xbar)
    rdi_vec = df + Aty
    rp_n = jnp.max(jnp.abs(Einv * rp), axis=1)
    rpi_n = jnp.max(jnp.abs(Einv * rpi), axis=1)
    rd_n = jnp.max(jnp.abs(Dinv * (Qx + q + Aty)), axis=1) * cinv
    rdi_n = jnp.max(jnp.abs(Dinv * rdi_vec), axis=1) * cinv
    return rp, rpi, w, active, rdi_vec, rp_n, rd_n, rpi_n, rdi_n
