"""Trajectory diagnostic: factor quality of scan vs CR variants along the
REAL level-704 solve path.

Drives the solver step-by-step (scan settings — the converging path),
and every SAMPLE iterations reassembles the exact Newton system K dx = rhs
host-side in float64, then measures the relative direction error of each
float32 factorization variant (scan / cr at depths / symmetric-product cr
at depths) including the safeguarded refinement — isolating exactly where
on the trajectory CR degrades and whether the symmetric-product form or
the depth limit repairs it.
"""
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import functools

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/examples")
from continuation import liswet  # noqa: E402

import qpdo_tpu as qt  # noqa: E402
from qpdo_tpu.operators import SparseOperator  # noqa: E402
from qpdo_tpu.solver.core import init_state, step  # noqa: E402
from qpdo_tpu.solver.sparse import setup_sparse  # noqa: E402

SAMPLE = int(sys.argv[1]) if len(sys.argv) > 1 else 25
LEVEL = int(sys.argv[2]) if len(sys.argv) > 2 else 704


def cr_sym_factor(D, E, max_levels=0):
    """Symmetric-product CR (candidate fix) — see cr_factor_micro.py."""
    chs = lambda L, X: jax.scipy.linalg.solve_triangular(
        L, jax.scipy.linalg.solve_triangular(L, X, lower=True),
        lower=True, trans=1)
    tsolve = lambda L, X: jax.scipy.linalg.solve_triangular(
        L, X, lower=True)
    zblk = jnp.zeros_like(D[:1])
    levels = []
    while D.shape[0] > 1 and (max_levels <= 0 or len(levels) < max_levels):
        k = D.shape[0]
        no, ne = k // 2, k - k // 2
        Lo = jnp.linalg.cholesky(D[1::2])
        Epad = jnp.concatenate([E[: k - 1], zblk], axis=0)
        Ejm1 = Epad[0::2][:no]
        Ej = Epad[1::2][:no]
        X = tsolve(Lo, Ejm1)
        Y = tsolve(Lo, jnp.swapaxes(Ej, -1, -2))
        right = jnp.swapaxes(X, -1, -2) @ X
        left = jnp.swapaxes(Y, -1, -2) @ Y
        right = 0.5 * (right + jnp.swapaxes(right, -1, -2))
        left = 0.5 * (left + jnp.swapaxes(left, -1, -2))
        Dnew = D[0::2]
        Dnew = Dnew.at[1:].add(-left[: ne - 1])
        Dnew = Dnew.at[:no].add(-right)
        Enew = -(jnp.swapaxes(Y, -1, -2) @ X)[: ne - 1]
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
    rng = np.random.default_rng(42)
    N = 22500
    t_fine = np.linspace(0, 1, N)
    d_fine = np.sin(4 * np.pi * t_fine) + 0.1 * rng.standard_normal(N)
    prob = liswet(LEVEL, np.interp(np.linspace(0, 1, LEVEL), t_fine, d_fine))
    Qs, qv, As, lv, uv = prob
    import scipy.sparse as sps
    Qd = sps.csr_matrix(Qs)
    Ad = sps.csr_matrix(As)

    s_scan = qt.Settings(eps_abs=1e-6, max_iter=3000, inner_max_iter=100,
                         eps_abs_in=0.1, rho=0.2, delta=1e-4, theta=0.9,
                         kkt_dtype="float32", mu_min=1e-7, refine_steps=3,
                         banded_algo="scan")
    op = setup_sparse(Qs, qv, As, lv, uv, 0.0, s_scan.scaling,
                      precond=s_scan.precond,
                      precond_block=s_scan.precond_block,
                      ruiz_kkt=s_scan.ruiz_kkt)
    st = init_state(op, s_scan, None, None, False, False)
    step_j = jax.jit(step, static_argnames=("settings",))

    nb, b = op.bd_tmpl.shape
    n = op.n
    pad = nb * b - n
    # scaled-space data for the exact K (float64)
    a_data = np.asarray(op.a_data)
    a_idx = np.asarray(op.a_idx)
    q_data = np.asarray(op.q_data)
    q_idx = np.asarray(op.q_idx)
    A64 = sps.csr_matrix((a_data, (a_idx[:, 0], a_idx[:, 1])),
                         shape=(op.m, n))
    Q64 = sps.csr_matrix((q_data, (q_idx[:, 0], q_idx[:, 1])),
                         shape=(n, n))

    variants = [
        ("scan", lambda D, E: SparseOperator._banded_factor_scan(D, E)),
        ("cr_asym0", lambda D, E: SparseOperator._banded_factor_cr(D, E, 0)),
        ("cr_asym2", lambda D, E: SparseOperator._banded_factor_cr(D, E, 2)),
        ("cr_sym0", lambda D, E: cr_sym_factor(D, E, 0)),
        ("cr_sym4", lambda D, E: cr_sym_factor(D, E, 4)),
    ]

    print(f"level={LEVEL} nb={nb} b={b} sampling every {SAMPLE} iters",
          flush=True)
    it = 0
    from qpdo_tpu import constants as _c
    while int(st.status) == _c.UNSOLVED and it < s_scan.max_iter:
        if it % SAMPLE == 0:
            # recompute the step's Newton system host-side
            mu = np.asarray(st.mu)
            sigma = float(st.sigma)
            Ax = np.asarray(st.Ax)
            y = np.asarray(st.y)
            ybar = np.asarray(st.ybar)
            x = np.asarray(st.x)
            xbar = np.asarray(st.xbar)
            Qx = np.asarray(st.Qx)
            Aty = np.asarray(st.Aty)
            l_ = np.asarray(op.l)
            u_ = np.asarray(op.u)
            q_ = np.asarray(op.q)
            wv = Ax + mu * (ybar - 0.5 * y)
            act = ((wv <= l_) | (wv >= u_)).astype(float)
            rpi = Ax + mu * (ybar - y) - np.clip(wv, l_, u_)
            rdi = Qx + q_ + sigma * (x - xbar) + Aty
            ytilde = (rpi / mu) * (2.0 - act)
            rhs = -(rdi + A64.T @ ytilde)
            w = act / mu
            K = (Q64 + sps.eye(n) * sigma
                 + A64.T @ sps.diags(w) @ A64).toarray()
            dx_true = np.linalg.solve(K, rhs)
            condK = np.linalg.cond(K)
            # banded blocks exactly as the solver assembles them (f32;
            # round-4: including the symmetric Jacobi equilibration —
            # the factor sees S K S, the wrapper applies dx = S z)
            D, E, s_jac = op._assemble_banded(
                jnp.asarray(w), jnp.asarray(sigma), s_scan)
            s_full = np.asarray(s_jac).reshape(-1)
            rp_pad = np.zeros(nb * b)
            rp_pad[:n] = rhs
            line = [f"it={it:5d} cond={condK:8.2e} "
                    f"mu_min={mu.min():.1e} |rhs|={np.linalg.norm(rhs):.1e}"]
            for name, fac in variants:
                solve32 = fac(D, E)
                f32 = lambda v: (np.asarray(
                    solve32(jnp.asarray(v * s_full,
                                        jnp.float32).reshape(nb, b))
                ).reshape(-1) * s_full)[:n].astype(np.float64)
                dx = f32(rp_pad)
                r = rhs - K @ dx
                for _ in range(3):  # safeguarded refinement, as in-code
                    rpz = np.zeros(nb * b)
                    rpz[:n] = r
                    dxn = dx + f32(rpz)
                    rn = rhs - K @ dxn
                    if np.linalg.norm(rn) < np.linalg.norm(r):
                        dx, r = dxn, rn
                err = (np.linalg.norm(dx - dx_true)
                       / max(np.linalg.norm(dx_true), 1e-30))
                line.append(f"{name}={err:8.1e}")
            print(" ".join(line), flush=True)
        st = step_j(op, s_scan, st)
        it += 1
    print(f"final status={int(st.status)} iters={it}", flush=True)


if __name__ == "__main__":
    main()
