"""Sparse problem setup: Ruiz scaling + SparseOperator construction.

The large-n ingestion path (reference: qpdo_setup's CHOLMOD deep-copy +
scale_data, src/qpdo.c:49-212 + src/scaling.c:24-91).  All scaling passes
run on the COO triplets directly — O(nnz) segment reductions instead of
dense row/col sweeps — with semantics identical to the dense path
(solver/scaling.py): Ruiz on A only, limit_scaling floor, cost scalar
c = 1/max(1, ||D q||_inf), bounds scaled by E.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as _c
from ..operators import SparseOperator
from .scaling import limit_scaling


def _as_triplets(M, dtype):
    """Accept scipy.sparse, BCOO, dense array-like, or a prebuilt
    ``(data, indices, shape)`` triple; return (data, indices (nse, 2)
    int32, shape) in row-sorted COO order.

    The triple form passes traced ``data`` through untouched (indices
    must be concrete and already row-sorted) — it is what makes
    ``diff.sparse_qp_layer`` traceable with a static pattern."""
    if isinstance(M, tuple) and len(M) == 3:
        data, idx, shape = M
        return jnp.asarray(data, dtype), jnp.asarray(idx, jnp.int32), shape
    try:
        from jax.experimental import sparse as jsparse
        if isinstance(M, jsparse.BCOO):
            Ms = jsparse.bcoo_sort_indices(M)
            return (jnp.asarray(Ms.data, dtype),
                    jnp.asarray(Ms.indices, jnp.int32), M.shape)
    except ImportError:  # pragma: no cover
        pass
    try:
        import scipy.sparse as sps
        if sps.issparse(M):
            coo = M.tocsr().tocoo()   # csr->coo gives row-sorted triplets
            return (jnp.asarray(coo.data, dtype),
                    jnp.asarray(np.stack([coo.row, coo.col], axis=1),
                                jnp.int32), coo.shape)
    except ImportError:  # pragma: no cover
        pass
    Md = np.asarray(M, dtype)
    r, c = np.nonzero(Md)
    return (jnp.asarray(Md[r, c], dtype),
            jnp.asarray(np.stack([r, c], axis=1), jnp.int32), Md.shape)


def pad_sparse_problem(p, n_pad: int, m_pad: int, dtype):
    """Pad a sparse ``(Q, q, A, l, u[, c])`` tuple to (n_pad, m_pad)
    inertly, in triplet form: padded variables get a unit Q diagonal and
    zero q (they solve to exactly 0 and stay 0 — same argument as
    utils.padding.pad_problem), padded constraint rows are all-zero with
    free bounds.  Returns a tuple ready for solve_sparse_batch."""
    import numpy as np

    from .. import constants as _c

    Q, q, A, l, u = p[:5]
    c = p[5] if len(p) > 5 else 0.0
    qd, qi, (nq, _) = _as_triplets(Q, dtype)
    ad, ai, (m, n) = _as_triplets(A, dtype)
    q = np.asarray(q, float).reshape(-1)
    n = q.shape[0]
    if n_pad < n or m_pad < m:
        raise ValueError(f"pad target ({n_pad},{m_pad}) smaller than "
                         f"({n},{m})")
    dn = n_pad - n
    if dn:
        diag = np.arange(n, n_pad, dtype=np.int32)
        qd = np.concatenate([np.asarray(qd), np.ones(dn)])
        qi = np.concatenate([np.asarray(qi),
                             np.stack([diag, diag], axis=1)])
    inf = float(_c.QPDO_INFTY)
    q_pad = np.concatenate([q, np.zeros(dn)])
    l_pad = np.concatenate([np.asarray(l, float).reshape(-1),
                            np.full(m_pad - m, -inf)])
    u_pad = np.concatenate([np.asarray(u, float).reshape(-1),
                            np.full(m_pad - m, inf)])
    return ((qd, qi, (n_pad, n_pad)), q_pad,
            (np.asarray(ad), np.asarray(ai), (m_pad, n_pad)),
            l_pad, u_pad, c)


def union_triplets(mats, dtype):
    """Re-express a sequence of same-shape sparse matrices on the UNION of
    their sparsity patterns: returns ``(datas, indices, shape)`` where
    ``indices`` (nnz_union, 2) is shared, row-sorted, and each instance's
    ``datas[b]`` carries explicit zeros on the entries it lacks.

    This is what makes mixed-pattern fleets vmappable (solve_sparse_batch):
    all index/scatter structures are built once on the union pattern while
    values stack along the batch axis.  Every sparse kernel here (matvecs,
    Ruiz scatter-norms, preconditioner extraction) treats an explicit zero
    exactly like an absent entry, so per-instance results are unchanged.
    Cost scales with nnz(union); for structurally similar instances that
    is ~nnz, for disjoint patterns it degrades toward sum(nnz).
    """
    trips = [_as_triplets(M, dtype) for M in mats]
    shape = trips[0][2]
    for _, _, s in trips[1:]:
        if tuple(s) != tuple(shape):
            raise ValueError(f"shape mismatch across instances: {s} vs "
                             f"{shape}")
    ncol = shape[1]
    keys = [np.asarray(idx[:, 0], np.int64) * ncol
            + np.asarray(idx[:, 1], np.int64) for _, idx, _ in trips]
    union = np.unique(np.concatenate(keys))  # sorted = row-major order
    indices = jnp.asarray(
        np.stack([union // ncol, union % ncol], axis=1), jnp.int32)
    datas = []
    for (data, _, _), k in zip(trips, keys):
        full = np.zeros((union.shape[0],), np.asarray(data).dtype)
        # accumulate (COO semantics): an instance may carry duplicate
        # (i, j) entries (e.g. an unsorted BCOO), which plain positional
        # assignment would silently drop
        np.add.at(full, np.searchsorted(union, k), np.asarray(data))
        datas.append(jnp.asarray(full, dtype))
    return datas, indices, shape


def _block_jacobi_indices(a_indices, q_indices, n, block: int,
                          pair_cap_factor: float = 40.0):
    """Precompute the scatter maps of the block-Jacobi preconditioner
    (host-side, from the static sparsity pattern).

    For A: all ordered pairs of nonzeros sharing (row, column-block) —
    each contributes w_r * a1 * a2 to block[blk][o1, o2] of A'WA.  For Q:
    entries whose (i, j) fall in the same diagonal block.  Returns
    (pjA, pjQ), or (None, None) when the pattern makes pair enumeration
    larger than ``pair_cap_factor * nnz`` (dense-ish rows — fall back to
    plain Jacobi)."""
    rows = np.asarray(a_indices[:, 0], np.int64)
    cols = np.asarray(a_indices[:, 1], np.int64)
    blk = cols // block
    order = np.lexsort((blk, rows))
    rs, bs = rows[order], blk[order]
    grp_start = np.flatnonzero(
        np.r_[True, (rs[1:] != rs[:-1]) | (bs[1:] != bs[:-1])])
    sizes = np.diff(np.r_[grp_start, len(rs)])
    n_pairs = int(np.sum(sizes.astype(np.int64) ** 2))
    if n_pairs > pair_cap_factor * max(len(rows), 1):
        return None, None
    sq = sizes ** 2
    starts_rep = np.repeat(grp_start, sq)
    pid = np.arange(n_pairs) - np.repeat(np.cumsum(sq) - sq, sq)
    s_rep = np.repeat(sizes, sq)
    t1 = order[starts_rep + pid // s_rep]
    t2 = order[starts_rep + pid % s_rep]
    pjA = (jnp.asarray(t1, jnp.int32), jnp.asarray(t2, jnp.int32),
           jnp.asarray(rows[t1], jnp.int32),
           jnp.asarray(cols[t1] // block, jnp.int32),
           jnp.asarray(cols[t1] % block, jnp.int32),
           jnp.asarray(cols[t2] % block, jnp.int32))

    qi = np.asarray(q_indices[:, 0], np.int64)
    qj = np.asarray(q_indices[:, 1], np.int64)
    same = qi // block == qj // block
    tq = np.flatnonzero(same)
    pjQ = (jnp.asarray(tq, jnp.int32),
           jnp.asarray(qi[tq] // block, jnp.int32),
           jnp.asarray(qi[tq] % block, jnp.int32),
           jnp.asarray(qj[tq] % block, jnp.int32))
    return pjA, pjQ


def _coarse_indices(a_indices, q_indices, n, block: int,
                    pair_cap_factor: float = 40.0):
    """Precompute the scatter maps of the coarse-grid correction
    (host-side): P = piecewise-constant aggregation of ``block`` columns,
    Kc = P'KP.  The A'WA part of Kc is the sum over ALL same-row nonzero
    pairs of ``w_r a1 a2`` scattered to their coarse columns (J = col //
    block); the Q part scatters every entry to its coarse cell.  Returns
    (pcA, pcQ, counts) or (None, None, None) when pair enumeration would
    exceed the cap (then no coarse level is used)."""
    rows = np.asarray(a_indices[:, 0], np.int64)
    cols = np.asarray(a_indices[:, 1], np.int64)
    nc = -(-n // block)
    order = np.argsort(rows, kind="stable")
    rs = rows[order]
    grp_start = np.flatnonzero(np.r_[True, rs[1:] != rs[:-1]])
    sizes = np.diff(np.r_[grp_start, len(rs)])
    n_pairs = int(np.sum(sizes.astype(np.int64) ** 2))
    if n_pairs > pair_cap_factor * max(len(rows), 1):
        return None, None, None
    sq = sizes ** 2
    starts_rep = np.repeat(grp_start, sq)
    pid = np.arange(n_pairs) - np.repeat(np.cumsum(sq) - sq, sq)
    s_rep = np.repeat(sizes, sq)
    t1 = order[starts_rep + pid // s_rep]
    t2 = order[starts_rep + pid % s_rep]
    pcA = (jnp.asarray(t1, jnp.int32), jnp.asarray(t2, jnp.int32),
           jnp.asarray(rows[t1], jnp.int32),
           jnp.asarray(cols[t1] // block, jnp.int32),
           jnp.asarray(cols[t2] // block, jnp.int32))
    qi = np.asarray(q_indices[:, 0], np.int64)
    qj = np.asarray(q_indices[:, 1], np.int64)
    pcQ = (jnp.asarray(qi // block, jnp.int32),
           jnp.asarray(qj // block, jnp.int32))
    counts = np.bincount(np.arange(n) // block, minlength=nc).astype(float)
    return pcA, pcQ, jnp.asarray(counts)


def _ell_enabled() -> bool:
    """Setup-time backend gate for the ELL matvec path.

    Scatter-adds are fast on XLA-CPU and the ELL padding/gather costs
    ~2x there; on TPU the scatter serializes and ELL is the fast path.
    QPDO_ELL=1/0 forces it either way (tests force 1 on CPU).  Resolved
    once per setup_sparse call — the result is baked into the operator
    (ell maps present vs None), never read inside traced code."""
    import os
    v = os.environ.get("QPDO_ELL", "auto")
    if v in ("1", "0"):
        return v == "1"
    return jax.default_backend() != "cpu"


def _ell_maps(keys_group, keys_other, out_dim: int,
              cap_width: int = 128, pad_factor: float = 8.0):
    """Padded-row (ELL) gather maps for one matvec direction (host-side).

    TPU scatter-adds (`.at[rows].add`) serialize badly on the device —
    they were the dominant cost of the CG hot loop (~3 s per Newton
    iteration at n=4000, logs/tpu_cg_size_probe_r3.log).  ELL re-expresses
    the matvec as a *gather* plus a dense row-sum:

        out[i] = sum_k data[gather[i, k]] * x[idx[i, k]] * mask[i, k]

    with every row padded to the max row-degree K — static shapes, no
    scatters, pure VPU work.  Returns (gather (out,K) i32, idx (out,K)
    i32, mask (out,K) i8) or ``None`` when the pattern is too irregular
    (K > cap_width, or padding exceeds ``pad_factor`` x nnz) — callers
    fall back to the scatter path.

    The maps are pattern-only (int leaves): same-pattern fleets broadcast
    them while the value arrays vmap, exactly like the pj/pc/bd maps.
    """
    g = np.asarray(keys_group, np.int64)
    nse = len(g)
    if nse == 0:
        return None
    counts = np.bincount(g, minlength=out_dim)
    K = max(int(counts.max()), 1)
    if K > cap_width or out_dim * K > pad_factor * nse + out_dim:
        return None
    order = np.argsort(g, kind="stable")
    gs = g[order]
    starts = np.zeros(out_dim + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.arange(nse) - starts[gs]
    gather = np.zeros((out_dim, K), np.int64)
    idx = np.zeros((out_dim, K), np.int64)
    mask = np.zeros((out_dim, K), np.int8)
    gather[gs, pos] = order
    idx[gs, pos] = np.asarray(keys_other, np.int64)[order]
    mask[gs, pos] = 1
    return (jnp.asarray(gather, jnp.int32), jnp.asarray(idx, jnp.int32),
            jnp.asarray(mask, jnp.int8))


def _banded_indices(a_indices, q_indices, n, max_bw: int = 128,
                    min_block: int = 8, pair_cap_factor: float = 40.0):
    """Precompute block-tridiagonal scatter maps for the banded direct
    Newton solve (host-side, from the static sparsity pattern).

    K = Q + sigma*I + A'WA has bandwidth  bw = max(bw(Q), max row span of
    A); when bw <= ``max_bw`` the matrix is exactly block-tridiagonal in
    blocks of size b >= bw, and a block-tridiagonal Cholesky (lax.scan of
    b x b factorizations) replaces CG entirely — the sparse-*direct*
    analogue of the reference's CHOLMOD backend (cholmod_interface.c:8-52)
    for banded patterns (LISWET/QBAND/AUG-style).  Returns
    (bdA, bdAsub, bdQ, bdQsub, tmpl) or Nones when the pattern does not
    qualify.  ``tmpl`` is an int32 (nb, b) zeros array carrying the static
    block geometry (shared, not vmapped, across same-pattern batches).
    """
    none = (None,) * 5
    rows = np.asarray(a_indices[:, 0], np.int64)
    cols = np.asarray(a_indices[:, 1], np.int64)
    qi = np.asarray(q_indices[:, 0], np.int64)
    qj = np.asarray(q_indices[:, 1], np.int64)

    bw_q = int(np.max(np.abs(qi - qj))) if len(qi) else 0
    if len(rows):
        cmax = np.full(int(rows.max()) + 1, -1, np.int64)
        cmin = np.full(int(rows.max()) + 1, np.iinfo(np.int64).max, np.int64)
        np.maximum.at(cmax, rows, cols)
        np.minimum.at(cmin, rows, cols)
        nonempty = cmax >= 0
        bw_a = int(np.max((cmax - cmin)[nonempty])) if nonempty.any() else 0
    else:
        bw_a = 0
    bw = max(bw_q, bw_a)
    if bw > max_bw:
        return none
    b = max(min_block, -(-max(bw, 1) // min_block) * min_block)
    if b >= n:  # degenerate: a single dense block — the dense path's job
        return none
    nb = -(-n // b)

    # same-row ordered pairs of A (as in _coarse_indices)
    order = np.argsort(rows, kind="stable")
    rs = rows[order]
    grp_start = np.flatnonzero(np.r_[True, rs[1:] != rs[:-1]])
    sizes = np.diff(np.r_[grp_start, len(rs)])
    n_pairs = int(np.sum(sizes.astype(np.int64) ** 2))
    if n_pairs > pair_cap_factor * max(len(rows), 1):
        return none
    sq = sizes ** 2
    starts_rep = np.repeat(grp_start, sq)
    pid = np.arange(n_pairs) - np.repeat(np.cumsum(sq) - sq, sq)
    s_rep = np.repeat(sizes, sq)
    t1 = order[starts_rep + pid // s_rep]
    t2 = order[starts_rep + pid % s_rep]
    blk1, blk2 = cols[t1] // b, cols[t2] // b
    diff = blk1 - blk2                       # in {-1, 0, 1} since b >= bw
    dsel = diff == 0
    ssel = diff == 1                         # sub-diagonal E_k = K[k+1, k]
    mk = lambda a, sel, dt=np.int32: jnp.asarray(a[sel].astype(dt))
    bdA = (mk(t1, dsel), mk(t2, dsel), mk(rows[t1], dsel),
           mk(blk1, dsel), mk(cols[t1] % b, dsel), mk(cols[t2] % b, dsel))
    bdAsub = (mk(t1, ssel), mk(t2, ssel), mk(rows[t1], ssel),
              mk(blk2, ssel), mk(cols[t1] % b, ssel), mk(cols[t2] % b, ssel))

    qb1, qb2 = qi // b, qj // b
    qdiff = qb1 - qb2
    qd = qdiff == 0
    qs = qdiff == 1
    tq = np.arange(len(qi))
    bdQ = (mk(tq, qd), mk(qb1, qd), mk(qi % b, qd), mk(qj % b, qd))
    bdQsub = (mk(tq, qs), mk(qb2, qs), mk(qi % b, qs), mk(qj % b, qs))
    tmpl = jnp.zeros((nb, b), jnp.int32)
    return bdA, bdAsub, bdQ, bdQsub, tmpl


def setup_sparse(Q, q, A, l, u, c=0.0, scaling_iters: int = _c.SCALING,
                 dtype=None, precond: str = "block_jacobi",
                 precond_block: int = 64,
                 banded_max_bw: int = 128,
                 ruiz_kkt: bool = False) -> SparseOperator:
    """Build a scaled SparseOperator from sparse (or dense) Q/A.

    ``Q`` must be the full symmetric matrix (both triangles), as in
    ``make_problem``.  Accepts scipy.sparse matrices, BCOO, or dense
    array-likes.  Host-side (the scaling loop runs as traced jnp ops but
    the construction itself is eager); the returned operator is a pytree —
    feed it to jitted solver entry points.

    When the KKT pattern's bandwidth is <= ``banded_max_bw`` the operator
    carries block-tridiagonal maps and Newton systems are solved by an
    exact banded direct factorization instead of CG (``_banded_indices``);
    0 disables the detection.

    ``ruiz_kkt`` equilibrates Q jointly with A (see
    scaling.ruiz_equilibrate_kkt); default False = reference parity
    (A-only Ruiz, scaling.c:36-63).
    """
    if dtype is None:
        dtype = jnp.zeros(0).dtype if not jax.config.jax_enable_x64 \
            else jnp.float64
    dtype = jnp.dtype(dtype)

    q = jnp.asarray(q, dtype).reshape(-1)
    n = q.shape[0]
    q_data, q_idx, _ = _as_triplets(Q, dtype)
    a_data, a_idx, (m, _) = _as_triplets(A, dtype)

    inf = jnp.asarray(_c.QPDO_INFTY, dtype)
    l = jnp.clip(jnp.asarray(l, dtype).reshape(-1), -inf, inf)
    u = jnp.clip(jnp.asarray(u, dtype).reshape(-1), -inf, inf)
    l_finite = (l > -inf).astype(dtype)
    u_finite = (u < inf).astype(dtype)

    one = jnp.asarray(1.0, dtype)
    rows, cols = a_idx[:, 0], a_idx[:, 1]
    qi, qj = q_idx[:, 0], q_idx[:, 1]

    if scaling_iters == 0:
        D = jnp.ones((n,), dtype)
        E = jnp.ones((m,), dtype)
        cost = one
        q_s = q
        q_data_s, a_data_s = q_data, a_data
        l_s, u_s = l, u
    elif ruiz_kkt:
        # Ruiz on the full KKT structure's triplets (the sparse analogue
        # of scaling.ruiz_equilibrate_kkt): column norms take the max over
        # Q's and A's entries per primal column, so a wide-scale Q is
        # equilibrated jointly with A instead of inheriting its
        # conditioning (opt-in; default is reference parity below).
        def body_kkt(_, carry):
            qdat, adat, D, E = carry
            absa = jnp.abs(adat)
            colA = jnp.zeros((n,), dtype).at[cols].max(absa)
            colQ = jnp.zeros((n,), dtype).at[qj].max(jnp.abs(qdat))
            rown = jnp.zeros((m,), dtype).at[rows].max(absa)
            d = jax.lax.rsqrt(limit_scaling(jnp.maximum(colA, colQ)))
            e = jax.lax.rsqrt(limit_scaling(rown))
            adat = adat * e[rows] * d[cols]
            qdat = qdat * d[qi] * d[qj]
            return qdat, adat, D * d, E * e

        q_data_s, a_data_s, D, E = jax.lax.fori_loop(
            0, scaling_iters, body_kkt,
            (q_data, a_data, jnp.ones((n,), dtype), jnp.ones((m,), dtype)))
        q_s = q * D
        cost = one / jnp.maximum(one, jnp.max(jnp.abs(q_s)))
        q_s = q_s * cost
        q_data_s = q_data_s * cost
        l_s, u_s = E * l, E * u
    else:
        # Ruiz on A's triplets (scaling.c:36-63 semantics, O(nnz) per pass)
        def body(_, carry):
            dat, D, E = carry
            absd = jnp.abs(dat)
            coln = jnp.zeros((n,), dtype).at[cols].max(absd)
            rown = jnp.zeros((m,), dtype).at[rows].max(absd)
            d = jax.lax.rsqrt(limit_scaling(coln))
            e = jax.lax.rsqrt(limit_scaling(rown))
            dat = dat * e[rows] * d[cols]
            return dat, D * d, E * e

        a_data_s, D, E = jax.lax.fori_loop(
            0, scaling_iters, body,
            (a_data, jnp.ones((n,), dtype), jnp.ones((m,), dtype)))
        # Q <- D Q D, q <- D q, cost scalar (scaling.c:65-79)
        q_data_s = q_data * D[qi] * D[qj]
        q_s = q * D
        cost = one / jnp.maximum(one, jnp.max(jnp.abs(q_s)))
        q_s = q_s * cost
        q_data_s = q_data_s * cost
        l_s, u_s = E * l, E * u

    diagQ = jnp.zeros((n,), dtype).at[qi].add(
        jnp.where(qi == qj, q_data_s, 0.0))

    pjA = pjQ = None
    pcA = pcQ = pc_counts = None
    bdA = bdAsub = bdQ = bdQsub = bd_tmpl = None
    if banded_max_bw > 0:
        bdA, bdAsub, bdQ, bdQsub, bd_tmpl = _banded_indices(
            np.asarray(a_idx), np.asarray(q_idx), n, banded_max_bw)
    # Preconditioner maps are built even when the banded direct maps exist:
    # Settings.newton_direct=False is a supported opt-out onto the CG path.
    if precond == "block_jacobi":
        pjA, pjQ = _block_jacobi_indices(np.asarray(a_idx),
                                         np.asarray(q_idx),
                                         n, precond_block)
        if pjA is not None:
            pcA, pcQ, pc_counts = _coarse_indices(np.asarray(a_idx),
                                                  np.asarray(q_idx),
                                                  n, precond_block)

    # ELL (padded-row gather) matvec maps — the TPU fast path for the CG
    # loop; None on irregular patterns (scatter fallback).  The backend
    # choice is resolved HERE, at setup time, so it is carried by the
    # operator's pytree structure (maps present vs None) and therefore by
    # every jit cache key — reading QPDO_ELL inside traced code could
    # silently reuse an executable compiled under the other value.
    ellQ = ellA = ellAt = None
    if _ell_enabled():
        rows_np = np.asarray(a_idx[:, 0])
        cols_np = np.asarray(a_idx[:, 1])
        qi_np = np.asarray(q_idx[:, 0])
        qj_np = np.asarray(q_idx[:, 1])
        ellQ = _ell_maps(qi_np, qj_np, n)
        ellA = _ell_maps(rows_np, cols_np, m)
        ellAt = _ell_maps(cols_np, rows_np, n)

    return SparseOperator(
        q_data=q_data_s, q_idx=q_idx, a_data=a_data_s, a_idx=a_idx,
        diagQ=diagQ, q=q_s, l=l_s, u=u_s,
        c=jnp.asarray(c, dtype), D=D, Dinv=one / D, E=E, Einv=one / E,
        cost=cost, cinv=one / cost, l_finite=l_finite, u_finite=u_finite,
        pjA=pjA, pjQ=pjQ, pcA=pcA, pcQ=pcQ, pc_counts=pc_counts,
        bdA=bdA, bdAsub=bdAsub, bdQ=bdQ, bdQsub=bdQsub, bd_tmpl=bd_tmpl,
        ellQ=ellQ, ellA=ellA, ellAt=ellAt)
