"""Microbenchmark: which block-tridiagonal factorization carries cond ~ 1e8
in float32?  Isolates the factorization from the solver loop.

Builds a LISWET-shaped K = I + sigma*I + A' W A (A = second differences,
W = active/mu with mu = 1e-7 on a random active pattern — the level-704
conditioning class), factors in float32 with:
  - scan (sequential block Cholesky)        [stable per RESULTS.md]
  - cr_asym (current CR: E D^{-1} E' as a general GEMM)
  - cr_sym  (CR with symmetric products:  X = L^{-1}E', update = X'X)
at several depth limits, then measures relative residuals of the raw f32
solve and of 3 float64 safeguarded-refinement sweeps.
"""
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from qpdo_tpu.operators import SparseOperator

chs = lambda L, X: jax.scipy.linalg.solve_triangular(
    L, jax.scipy.linalg.solve_triangular(L, X, lower=True),
    lower=True, trans=1)


def cr_sym_factor(D, E, max_levels=0):
    """CR with symmetric Schur products: with Lo = chol(D_odd),
    X = Lo^{-1} E_{j-1}, Y = Lo^{-1} E_j'   (triangular solves only)
    right update (even e=t):    E_{j-1}' D^{-1} E_{j-1} = X' X
    left  update (even e=t+1):  E_j      D^{-1} E_j'    = Y' Y
    coupling E_new = -E_j D^{-1} E_{j-1}                = -(Y' X)'?  no:
      E_j D^{-1} E_{j-1} = (L^{-1}E_j')' (L^{-1}E_{j-1}) = Y' X."""
    tsolve = lambda L, X: jax.scipy.linalg.solve_triangular(L, X, lower=True)
    zblk = jnp.zeros_like(D[:1])
    levels = []
    while D.shape[0] > 1 and (max_levels <= 0 or len(levels) < max_levels):
        k = D.shape[0]
        no, ne = k // 2, k - k // 2
        Dodd = D[1::2]
        Lo = jnp.linalg.cholesky(Dodd)
        Epad = jnp.concatenate([E[: k - 1], zblk], axis=0)
        Ejm1 = Epad[0::2][:no]
        Ej = Epad[1::2][:no]
        X = tsolve(Lo, Ejm1)                     # L^{-1} E_{j-1}
        Y = tsolve(Lo, jnp.swapaxes(Ej, -1, -2))  # L^{-1} E_j'
        right = jnp.swapaxes(X, -1, -2) @ X      # X'X, symmetric PSD
        left = jnp.swapaxes(Y, -1, -2) @ Y       # Y'Y, symmetric PSD
        # re-symmetrize to kill GEMM-order roundoff asymmetry
        right = 0.5 * (right + jnp.swapaxes(right, -1, -2))
        left = 0.5 * (left + jnp.swapaxes(left, -1, -2))
        Dnew = D[0::2]
        Dnew = Dnew.at[1:].add(-left[: ne - 1])
        Dnew = Dnew.at[:no].add(-right)
        Enew = -(jnp.swapaxes(Y, -1, -2) @ X)[: ne - 1]
        # Ua = D^{-1}E_{j-1} = L^{-T}X, Ub = D^{-1}E_j' = L^{-T}Y (solve use)
        Ua = jax.scipy.linalg.solve_triangular(Lo, X, lower=True, trans=1)
        Ub = jax.scipy.linalg.solve_triangular(Lo, Y, lower=True, trans=1)
        levels.append((Lo, Ua, Ub, Ejm1, Ej, k, no, ne))
        D, E = Dnew, Enew
    if D.shape[0] == 1:
        Lfin = jnp.linalg.cholesky(D[0])
        coarse = lambda r: chs(Lfin, r[0][:, None])[:, 0][None]
    else:
        coarse = SparseOperator._banded_factor_scan(D, E)

    def solve(rb):
        rs_odd = []
        r = rb
        for Lo, Ua, Ub, Ejm1, Ej, k, no, ne in levels:
            yo = chs(Lo, r[1::2][..., None])[..., 0]
            rs_odd.append(yo)
            rnew = r[0::2]
            rnew = rnew.at[1:].add(-(Ej @ yo[..., None])[..., 0][: ne - 1])
            rnew = rnew.at[:no].add(
                -(jnp.swapaxes(Ejm1, -1, -2) @ yo[..., None])[..., 0])
            r = rnew
        x = coarse(r)
        for (Lo, Ua, Ub, Ejm1, Ej, k, no, ne), yo in zip(
                reversed(levels), reversed(rs_odd)):
            xe = x
            xl = xe[:no]
            xr = jnp.concatenate([xe[1:], jnp.zeros_like(xe[:1])],
                                 axis=0)[:no]
            xo = yo - (Ua @ xl[..., None])[..., 0] \
                - (Ub @ xr[..., None])[..., 0]
            x = jnp.zeros((k,) + xe.shape[1:], xe.dtype)
            x = x.at[0::2].set(xe).at[1::2].set(xo)
        return x

    return solve


def main():
    rng = np.random.default_rng(0)
    n, b = 704, 8
    nb = -(-n // b)
    npad = nb * b
    # LISWET-shaped K at the divergence conditioning
    e = np.ones(n)
    A = (np.diag(e[:-2], 0)[: n - 2, :n] * 0)  # placeholder
    A = np.zeros((n - 2, n))
    ii = np.arange(n - 2)
    A[ii, ii] = 1.0
    A[ii, ii + 1] = -2.0
    A[ii, ii + 2] = 1.0
    act = rng.random(n - 2) < 0.5
    w = np.where(act, 1e7, 0.0)
    K = np.eye(n) + 1e-3 * np.eye(n) + A.T @ (w[:, None] * A)
    print("cond(K) =", f"{np.linalg.cond(K):.2e}")
    Kp = np.zeros((npad, npad))
    Kp[:n, :n] = K
    Kp[np.arange(n, npad), np.arange(n, npad)] = 1.0
    D = np.stack([Kp[i * b:(i + 1) * b, i * b:(i + 1) * b]
                  for i in range(nb)])
    E = np.stack([Kp[(i + 1) * b:(i + 2) * b, i * b:(i + 1) * b]
                  for i in range(nb - 1)])
    rhs = rng.standard_normal(n)
    rp = np.zeros(npad)
    rp[:n] = rhs
    dx_true = np.linalg.solve(K, rhs)

    Kj = jnp.asarray(K)
    rhsj = jnp.asarray(rhs)

    def report(name, solve32):
        dx = np.asarray(solve32(jnp.asarray(rp, jnp.float32).reshape(nb, b))
                        ).reshape(-1)[:n].astype(np.float64)
        raw = np.linalg.norm(K @ dx - rhs) / np.linalg.norm(rhs)
        # 3 safeguarded f64 refinement sweeps with the f32 factor
        r = rhs - K @ dx
        for _ in range(3):
            rp2 = np.zeros(npad, np.float32)
            rp2[:n] = r
            d = np.asarray(solve32(jnp.asarray(rp2).reshape(nb, b))
                           ).reshape(-1)[:n].astype(np.float64)
            dx_new = dx + d
            r_new = rhs - K @ dx_new
            if np.linalg.norm(r_new) < np.linalg.norm(r):
                dx, r = dx_new, r_new
        ref = np.linalg.norm(r) / np.linalg.norm(rhs)
        err = np.linalg.norm(dx - dx_true) / np.linalg.norm(dx_true)
        print(f"{name:28s} raw_rel={raw:9.2e} refined_rel={ref:9.2e} "
              f"x_err={err:9.2e}")

    D32, E32 = jnp.asarray(D, jnp.float32), jnp.asarray(E, jnp.float32)
    report("scan", SparseOperator._banded_factor_scan(D32, E32))
    for lv in (0, 1, 2, 4):
        report(f"cr_asym levels={lv}",
               SparseOperator._banded_factor_cr(D32, E32, lv))
    for lv in (0, 1, 2, 4):
        report(f"cr_sym  levels={lv}", cr_sym_factor(D32, E32, lv))


if __name__ == "__main__":
    main()
