"""Distributed Schur-complement solve for block-angular (arrow) KKT systems.

TP/model-parallel scale-out for structured QPs (SURVEY.md §2.4, §5): when
the constraint matrix is block-angular (scenario-structured MPC, stochastic
programs), the Newton KKT matrix takes the arrow form

    K = [[K00, B_1', ..., B_S'],
         [B_1, K_11,          ],
         [ .         .        ],
         [B_S,          K_SS ]]

with a small coupled block (first-stage variables, size n0) and S
independent scenario blocks.  The factorization distributes:

  1. locally per scenario: factor K_ss, form B_s' K_ss^-1 B_s and
     B_s' K_ss^-1 r_s                       (vmapped batched Cholesky)
  2. one ``psum`` over the scenario mesh axis reduces the Schur complement
     S0 = K00 - sum_s B_s' K_ss^-1 B_s and its rhs      (ICI collective)
  3. the dense n0 x n0 Schur system solves replicated on every device
  4. local back-substitution x_s = K_ss^-1 (r_s - B_s x0)

The reference solver has no distributed anything (single-thread CHOLMOD);
this is the TPU-native answer to "what replaces the sparse factorization at
scales one chip can't hold".
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .linalg import cholesky_solve


class ArrowSystem(NamedTuple):
    """Arrow-structured SPD system: dense coupled block + scenario blocks."""

    K00: jax.Array  # (n0, n0)     coupled block, SPD
    Kss: jax.Array  # (S, ns, ns)  scenario diagonal blocks, SPD
    Bs: jax.Array   # (S, ns, n0)  coupling blocks


def _local_contribution(Kss, Bs, rs):
    """Per-shard: Kss^-1 applied to [Bs | rs], plus Schur contributions."""
    def one(Kb, Bb, rb):
        rhs = jnp.concatenate([Bb, rb[:, None]], axis=1)   # (ns, n0+1)
        sol = cholesky_solve(Kb, rhs)                      # Kss^-1 [B | r]
        KinvB, Kinvr = sol[:, :-1], sol[:, -1]
        return Bb.T @ KinvB, Bb.T @ Kinvr, KinvB, Kinvr

    return jax.vmap(one)(Kss, Bs, rs)


def arrow_solve(system: ArrowSystem, r0, rs):
    """Single-device reference solve of the arrow system.

    Returns (x0, xs) with shapes (n0,), (S, ns)."""
    SB, Sr, KinvB, Kinvr = _local_contribution(system.Kss, system.Bs, rs)
    S0 = system.K00 - jnp.sum(SB, axis=0)
    rhs0 = r0 - jnp.sum(Sr, axis=0)
    x0 = cholesky_solve(S0, rhs0)
    xs = Kinvr - jnp.einsum("sij,j->si", KinvB, x0)
    return x0, xs


def arrow_solve_sharded(system: ArrowSystem, r0, rs, mesh: Mesh,
                        axis: str = "scenario"):
    """Distributed arrow solve: scenario blocks sharded over ``axis``,
    Schur reduction via one ``psum`` riding the ICI, coupled solve
    replicated, local back-substitution."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(), P(axis)),
        out_specs=(P(), P(axis)),
        check_vma=False)
    def solve(K00, Kss, Bs, r0, rs_):
        SB, Sr, KinvB, Kinvr = _local_contribution(Kss, Bs, rs_)
        S0 = K00 - jax.lax.psum(jnp.sum(SB, axis=0), axis)
        rhs0 = r0 - jax.lax.psum(jnp.sum(Sr, axis=0), axis)
        x0 = cholesky_solve(S0, rhs0)          # replicated on every device
        xs = Kinvr - jnp.einsum("sij,j->si", KinvB, x0)
        return x0, xs

    return solve(system.K00, system.Kss, system.Bs, r0, rs)


def arrow_to_dense(system: ArrowSystem):
    """Assemble the dense K (test utility)."""
    S, ns, n0 = system.Bs.shape
    n = n0 + S * ns
    K = jnp.zeros((n, n), system.K00.dtype)
    K = K.at[:n0, :n0].set(system.K00)
    for s in range(S):
        lo = n0 + s * ns
        K = K.at[lo:lo + ns, lo:lo + ns].set(system.Kss[s])
        K = K.at[lo:lo + ns, :n0].set(system.Bs[s])
        K = K.at[:n0, lo:lo + ns].set(system.Bs[s].T)
    return K
