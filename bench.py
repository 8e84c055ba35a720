"""Benchmark: batched small-QP throughput on one TPU chip.

Config: the BASELINE.json headline — batched random convex QPs (n=100,
m=150, box constraints, eps=1e-6), lock-step vmapped solve.  Prints one JSON
line: {"metric", "value", "unit", "vs_baseline"} where the baseline is the
north-star target of 10,000 QPs/s/chip (the reference publishes no numbers,
BASELINE.md).

Also reports FLOP/MFU accounting: analytic per-iteration FLOPs of the
algorithm (KKT formation, Cholesky, refinement, GEMMs) divided by the
chip's *measured* f32 matmul peak — so "the chip is saturated" is a
measurement, not an assertion.
"""

import json
import time

import numpy as np


def flops_per_iteration(n: int, m: int, refine_steps: int,
                        kkt_update_rows: int = 0,
                        anchor_every: int = 10,
                        with_certs: bool = True,
                        kkt_solver: str = "chol",
                        kkt_ns_steps: int = 2,
                        kkt_inv_refresh: bool = True) -> float:
    """Analytic FLOPs of one solver iteration for one problem (multiply+add
    = 2 FLOPs).  Counts the O(n^2)/O(mn) dense work of solver/core.py
    `step` + ops/linalg.py `newton_system_solve` (or its incremental
    variant when kkt_update_rows > 0); elementwise O(n+m) terms are
    ignored (<1%).  ``with_certs=False`` drops the infeasibility-
    certificate GEMMs, which the float32 warmup phase skips
    (warmup_settings zeroes eps_*_inf) — the true per-solve FLOPs sit
    between the two variants, so bench.py reports both MFU bounds."""
    cholesky = n ** 3 / 3.0
    tri_solves = 2.0 * n * n                     # two triangular solves
    at_ytilde = 2.0 * m * n                      # rhs matvec
    qdx = 2.0 * n * n                            # Q dx (linesearch input)
    if with_certs:
        cert_gemms = 8.0 * m * n + 2.0 * n * n   # A@[dx,dxc], A'@[dy,dyc], Qdxc
    else:
        cert_gemms = 4.0 * m * n                 # A@dx, A'@dy only
    if kkt_solver == "ns":
        # Newton-Schulz-tracked inverse: formation + KX/NS GEMMs + the
        # apply/refine GEMVs, plus the anchored exact inverse rebuild
        # (Cholesky + matrix-RHS trisolve + GEMM) amortized over
        # anchor_every iterations
        formation = 2.0 * m * n * n
        ns = kkt_ns_steps * 4.0 * n ** 3 + 2.0 * n ** 3  # steps + resym/KX
        apply_refine = 6.0 * n * n
        anchor = ((n ** 3 / 3.0 + 2.0 * n ** 3) / anchor_every
                  if kkt_inv_refresh else 0.0)  # init-only: no rebuild
        return (formation + ns + apply_refine + anchor + at_ytilde
                + qdx + cert_gemms)
    if kkt_update_rows > 0:
        k = min(kkt_update_rows, m)
        formation = (2.0 * k * n * n               # top-k row update
                     + (2.0 * m * n * n) / anchor_every)  # chunk rebuild
        kmv = 2.0 * n * n + 4.0 * m * n
        pcg = (1 + max(refine_steps, 1)) * (kmv + tri_solves)
        return (formation + cholesky + tri_solves + pcg + at_ytilde
                + qdx + cert_gemms)
    formation = 2.0 * m * n * n + m * n          # A' (w o A) + row scale
    refine = refine_steps * (tri_solves + 2.0 * n * n + 4.0 * m * n)
    return (formation + cholesky + tri_solves + refine + at_ytilde
            + qdx + cert_gemms)


def polish_flops(n: int, m: int, refine_steps: int) -> float:
    """Analytic FLOPs of one solution-polish call (saddle LU + refinement
    + verification matvecs, ops/linalg.saddle_polish_solve)."""
    s = n + m
    lu = (2.0 / 3.0) * s ** 3
    solves = (1 + refine_steps) * 2.0 * s * s
    refine_mv = refine_steps * (2.0 * n * n + 4.0 * m * n)
    verify = 2.0 * n * n + 4.0 * m * n
    return lu + solves + refine_mv + verify


def measure_peak_tflops(reps: int = 3, size: int = 4096,
                        bench_shape: "tuple | None" = (256, 100, 150)) -> dict:
    """Measured matmul peak of the attached chip, f32-highest (the solver's
    arithmetic mode) and bf16 (the hardware's nominal fast path).

    Also probes a *bench-shaped* batched GEMM (``f32_bench_shape``): the
    solver's dominant op is the KKT formation A'(w∘A) — a (B, n, m) @
    (B, m, n) batched matmul at n=100/m=150, not one huge square GEMM.
    The 4096² probe measured BELOW the solver's own FLOP rate in every
    round-3 run (`peak_floored_from_solver` fired 100%), i.e. it is an
    unrepresentative shape for this chip state; the bench-shaped probe
    gives the MFU denominator a measurement at the shape that actually
    runs (round-3 verdict item 7)."""
    import jax
    import jax.numpy as jnp

    def _sync(r):
        # sync via a ONE-ELEMENT host transfer: the slice depends on the
        # whole kernel completing, but moves 4 bytes — np.asarray(r) of
        # the full result would time the PCIe/host transfer, not the
        # matmul (measured: it buried the batched-probe compute under a
        # 10 MB pull and read 0.003 TFLOPS)
        np.asarray(jnp.ravel(r)[:1])

    def _time_best(f, args, flops):
        _sync(f(*args))  # compile + warm
        # best-of-reps: host contention on the shared axon frontend can
        # inflate any single rep ~2x; the min estimates the uncontended cost
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(f(*args))
            best = min(best, time.perf_counter() - t0)
        return flops / best / 1e12

    out = {}
    # CHAIN dependent matmuls inside one jit program: the round-4 per-op
    # profile (scripts/tpu_per_op_profile.py) showed every single-launch
    # measurement on axon pays a ~25-30 ms dispatch/sync floor, which
    # caps a one-matmul probe at flops/floor regardless of the chip's
    # true rate (the 4096² single-shot reading of 4.3 TFLOPS is ~exactly
    # 137 GFLOP / 30 ms).  R chained matmuls amortize the floor R-fold.
    R = 16
    for name, dtype, prec in (("f32_highest", jnp.float32, "highest"),
                              ("bf16", jnp.bfloat16, "default")):
        a = jnp.ones((size, size), dtype)
        b = jnp.ones((size, size), dtype)

        def mm(a, b, _prec=prec):
            with jax.default_matmul_precision(_prec):
                return a @ b

        out[name] = _time_best(jax.jit(mm), (a, b), 2.0 * size ** 3)

        def mm_chain(a, b, _prec=prec):
            def body(_, y):
                with jax.default_matmul_precision(_prec):
                    # rescale keeps magnitudes O(1) across the chain; the
                    # multiply is VPU noise next to the matmul
                    return (y @ b) * (1.0 / size)

            return jax.lax.fori_loop(0, R, body, a)

        out[name + "_chained"] = _time_best(
            jax.jit(mm_chain), (a, b), 2.0 * R * size ** 3)

    if bench_shape is not None:
        B, n, m = bench_shape
        a = jnp.ones((B, m, n), jnp.float32)

        def formation(a):
            with jax.default_matmul_precision("highest"):
                return jnp.einsum("bmn,bmk->bnk", a, a)

        out["f32_bench_shape"] = _time_best(
            jax.jit(formation), (a,), 2.0 * B * m * n * n)

        def formation_chain(a):
            def body(_, av):
                with jax.default_matmul_precision("highest"):
                    K = jnp.einsum("bmn,bmk->bnk", av, av)
                # feed one scalar of K back so reps cannot be CSE'd away
                # (1e-30 * K rounds away under f32 addition, so the data
                # is unchanged but the dependency is not foldable)
                return av * (1.0 + 1e-30 * K[:, :1, :1])

            return jax.lax.fori_loop(0, R, body, a)

        out["f32_bench_shape_chained"] = _time_best(
            jax.jit(formation_chain), (a,), 2.0 * R * B * m * n * n)

        # ns-mode dominant op: batched SQUARE (B,n,n)@(B,n,n) GEMMs (the
        # Newton-Schulz updates) — a different tile mix than the (m,n)
        # formation; without this probe the ns bench reads mfu clamped
        # at 1.0 (the solver out-runs the formation-shaped denominator)
        x = jnp.ones((B, n, n), jnp.float32)

        def ns_chain(x):
            def body(_, xv):
                with jax.default_matmul_precision("highest"):
                    y = jnp.einsum("bij,bjk->bik", xv, xv)
                return xv * (1.0 + 1e-30 * y[:, :1, :1])

            return jax.lax.fori_loop(0, R, body, x)

        out["f32_ns_shape_chained"] = _time_best(
            jax.jit(ns_chain), (x,), 2.0 * R * B * n ** 3)
    return out


def _wait_for_backend(max_wait_s: "float | None" = None) -> bool:
    """Block until the JAX backend initializes (in a subprocess, so a failed
    attempt doesn't poison this process's cached backend state).  The axon
    TPU occasionally crashes and takes minutes to re-initialize; without
    this, a bench run landing in that window reports nothing at all.
    Returns True if the backend came up, False if the wait was exhausted."""
    import os
    import subprocess
    import sys

    if max_wait_s is None:
        max_wait_s = float(os.environ.get("QPDO_BENCH_WAIT", "1800"))
    if max_wait_s <= 0:
        return True
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            ok = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=max(60.0, max_wait_s / 2),
            ).returncode == 0
        except subprocess.TimeoutExpired:
            # a hung probe (chip mid-re-init) counts as a failed attempt
            ok = False
        if ok:
            return True
        if time.monotonic() > deadline:
            print(f"# backend probe failed {attempt}x after "
                  f"{max_wait_s:.0f}s", flush=True)
            return False
        time.sleep(30.0)


def acquire_chip_lock(max_wait_s: "float | None" = None,
                      lock_path: str = "/tmp/qpdo_tpu_chip.lock"):
    """Mutual-exclusion token for the chip: blocks until an exclusive
    flock on ``lock_path`` is held, then returns the open file object
    (hold it for the process lifetime; the kernel releases the lock on
    exit/crash).  Two bench/probe processes started together can never
    co-run — one waits on the lock instead of both proceeding after the
    politeness-scan deadline (the round-2 known limitation).

    Returns None only if the wait deadline expires (lock holder stuck);
    callers proceed in that case, matching the old politeness behavior,
    but the event is printed."""
    import fcntl
    import os

    if max_wait_s is None:
        max_wait_s = float(os.environ.get("QPDO_BENCH_QUEUE_WAIT", "3600"))
    fh = open(lock_path, "a+")  # noqa: SIM115 — held for process lifetime
    deadline = time.monotonic() + max_wait_s
    waited = False
    while True:
        try:
            fcntl.flock(fh.fileno(), fcntl.LOCK_EX | fcntl.LOCK_NB)
            return fh
        except OSError:
            if time.monotonic() > deadline:
                print("# chip lock still held after wait; proceeding",
                      flush=True)
                fh.close()
                return None
            if not waited:
                print("# chip lock held by another process; waiting",
                      flush=True)
                waited = True
            time.sleep(10.0)


def _wait_for_queue_idle(max_wait_s: "float | None" = None) -> None:
    """Politeness wait for TPU processes that do NOT take the flock token
    (acquire_chip_lock) — e.g. older experiment scripts: if a queued
    experiment runner (tpu_queue*.sh) is active, wait for it to finish
    before taking the chip.  Detection scans /proc cmdlines — no signals
    are sent.  Mutual exclusion between lock-aware processes is the
    flock's job, not this scan's."""
    import os

    if max_wait_s is None:
        max_wait_s = float(os.environ.get("QPDO_BENCH_QUEUE_WAIT", "3600"))
    # exclude self and every ancestor (e.g. a `timeout N python bench.py`
    # wrapper whose cmdline also carries the marker)
    mine = set()
    pid = os.getpid()
    while pid > 1:
        mine.add(pid)
        try:
            with open(f"/proc/{pid}/stat") as fh:
                pid = int(fh.read().split(")")[-1].split()[1])
        except (OSError, ValueError, IndexError):
            break
    # the queue scripts' job commands (not their idle backend probes,
    # which exit as soon as the chip answers)
    job_markers = (b"bench.py", b"tpu_sparse_newton_probe", b"cg_traj",
                   b"benchmarks/run.py", b"mm_like.py", b"fuzz_sparse.py",
                   b"tpu_banded_cr", b"tpu_cg_size_probe",
                   b"examples/continuation.py",
                   b"tpu_pallas_residuals_bench",
                   b"tpu_bigrand_retry", b"cr_stability_probe")

    def queue_active() -> bool:
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) in mine:
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as fh:
                    cmd = fh.read().replace(b"\0", b" ")
            except OSError:
                continue
            if any(m in cmd for m in job_markers) and b"python" in cmd:
                return True
        return False

    deadline = time.monotonic() + max_wait_s
    waited = False
    while queue_active():
        if time.monotonic() > deadline:
            print("# queue still active after wait; proceeding", flush=True)
            return
        if not waited:
            print("# experiment queue active; waiting for the chip",
                  flush=True)
            waited = True
        time.sleep(60.0)


def main():
    import os

    import jax

    _chip_lock = acquire_chip_lock()  # held (kernel-released) until exit
    _wait_for_queue_idle()
    platform = None
    if not _wait_for_backend():
        # the TPU never recovered: report a CPU number (flagged in the JSON)
        # rather than nothing — the env var alone is ignored (sitecustomize),
        # so set the config BEFORE any computation touches the backend
        print("# TPU unavailable; falling back to CPU", flush=True)
        jax.config.update("jax_platforms", "cpu")
        platform = "cpu"
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import qpdo_tpu as qt
    from qpdo_tpu.parallel.batch import _solve_batch_compact

    B = int(os.environ.get("QPDO_BENCH_B", 256))
    n, m = 100, 150

    rng = np.random.default_rng(0)
    M = rng.standard_normal((B, n, n))
    Q = np.einsum("bij,bkj->bik", M, M) / n + 0.1 * np.eye(n)
    problems = qt.Problem(
        Q=jnp.asarray(Q), q=jnp.asarray(rng.standard_normal((B, n))),
        A=jnp.asarray(rng.standard_normal((B, m, n))),
        l=jnp.asarray(-rng.random((B, m))),
        u=jnp.asarray(rng.random((B, m))),
        c=jnp.zeros((B,)))

    # MXU-aligned inert padding (round-4 verdict item 2: the measured 50x
    # tile-shape penalty at n=100/m=150).  QPDO_BENCH_PAD="128x152" solves
    # the SAME problems padded to n=128 (lane-aligned) / m=152
    # (sublane-aligned); padding is provably inert (utils/padding.py,
    # tests/test_padding.py) so the QPs/s numerator is unchanged while
    # every GEMM/Cholesky runs at an MXU-friendly tile.
    n_s, m_s = n, m  # the shapes the device actually solves at
    problems_orig = problems  # oracle always checks the ORIGINAL data
    pad_env = os.environ.get("QPDO_BENCH_PAD", "")
    if pad_env:
        from qpdo_tpu.utils.padding import pad_problem
        n_s, m_s = (int(v) for v in pad_env.split("x"))
        problems = jax.vmap(lambda p: pad_problem(p, n_s, m_s))(problems)

    # Two-phase precision + solution polish: full float32 solve to
    # warmup_eps (1e-3), then one exact active-set saddle solve (polish) —
    # verified per problem against the recomputed residuals — which lets
    # ~83% of the batch skip the float64 accurate phase entirely; the rest
    # polish-fail and run the anchored mixed-GEMM phase 2 to 1e-6.
    # Sort-free bisection linesearch with a float32 root find; matmuls at
    # HIGHEST precision.  Every knob was measured (RESULTS.md ablations).
    settings = qt.Settings(eps_abs=1e-6, max_iter=300, inner_max_iter=50,
                           eps_abs_in=0.1, rho=0.02, delta=0.1,
                           refine_steps=2, kkt_dtype="float32",
                           hybrid_warmup=True, mu_min=1e-7,
                           cert_dtype="float32",
                           linesearch=os.environ.get(
                               "QPDO_BENCH_LINESEARCH", "bisect"),
                           linesearch_dtype="float32",
                           phase2_gemm_dtype="float32", hard_rows=8,
                           anchor_every=10,
                           newton_full_step=bool(int(
                               os.environ.get("QPDO_BENCH_FULLSTEP", "1"))),
                           # 1e-4 since round 5: with polish off, a
                           # deeper f32 warmup moves the remaining
                           # accurate-phase iterations onto the cheap
                           # path (1596 vs 1168 QPs/s at 1e-3+nopolish)
                           warmup_eps=float(
                               os.environ.get("QPDO_BENCH_WEPS", "1e-4")),
                           warmup_matmul_precision=os.environ.get(
                               "QPDO_BENCH_WARMUP_PREC", "highest"),
                           kkt_update_rows=int(
                               os.environ.get("QPDO_BENCH_KKTROWS", "0")),
                           # 0 measured: iteration-neutral on this family
                           # (CPU B=64 identical 57.38) and +5.9% QPs/s on
                           # the op-rate-bound chip (RESULTS.md round 3);
                           # the library default stays 1 (fuzz shows hard
                           # instances can pay iterations for the cut)
                           warmup_refine_steps=int(
                               os.environ.get("QPDO_BENCH_WREFINE", "0")),
                           # polish OFF since round 5: the batched
                           # saddle LU (lax.linalg, sequential) became
                           # the bottleneck once the ns mode removed the
                           # Cholesky path — phase 2 under ns finishes
                           # the tail cheaper than the polish skips it
                           # (1168 vs 975 QPs/s measured; also raised at
                           # B=4096)
                           polish=bool(int(
                               os.environ.get("QPDO_BENCH_POLISH", "0"))),
                           # in-loop Pallas A/B (round-3 verdict item 2):
                           # QPDO_BENCH_PALLAS in {"", "formation",
                           # "residuals", "both", "kkt", "all"} — "kkt"
                           # fuses the whole Newton solve into one kernel
                           # (ops/pallas_kkt.py), "all" = kkt + residuals
                           pallas_formation=os.environ.get(
                               "QPDO_BENCH_PALLAS", "") in
                               ("formation", "both"),
                           pallas_residuals=os.environ.get(
                               "QPDO_BENCH_PALLAS", "") in
                               ("residuals", "both", "all"),
                           pallas_kkt=os.environ.get(
                               "QPDO_BENCH_PALLAS", "") in
                               ("kkt", "all"),
                           # op-count cut A/B (round-3 verdict item 6)
                           fused_newton_rhs=bool(int(os.environ.get(
                               "QPDO_BENCH_FUSEDRHS", "0"))),
                           # round-5 factorization-free dense Newton
                           # solve A/B: "cg"/"inv"/"ns" replace the
                           # 0.02-TFLOPS batched Cholesky/trisolve with
                           # GEMM/matvec work (docs/API.md); "ns" is the
                           # fixed-big-op Newton-Schulz-tracked inverse
                           # DEFAULT since round 5: the Newton-Schulz-
                           # tracked inverse at 5 steps, init-only (no
                           # periodic lax.linalg rebuild) — measured
                           # 974.7 QPs/s at B=256 vs 585 for the direct
                           # path (oracle 1.0 both; refresh-on costs
                           # 2.9x, logs/bench_ns5*_r5d.log)
                           kkt_solver=os.environ.get(
                               "QPDO_BENCH_KKTSOLVER", "ns"),
                           kkt_ns_steps=int(os.environ.get(
                               "QPDO_BENCH_NSSTEPS", "5")),
                           kkt_inv_refresh=bool(int(os.environ.get(
                               "QPDO_BENCH_NSREFRESH", "0"))),
                           kkt_cg_fixed=int(os.environ.get(
                               "QPDO_BENCH_CGFIXED", "0")))

    def run_sync():
        # straggler compaction: identical per-problem algorithm decisions
        # (statuses/iterations; iterates to fp program variation), the
        # unsolved tail finishes in a B/4 sub-batch
        res = _solve_batch_compact(problems, settings, None, None,
                                   False, False)
        # force full execution via host transfer (block_until_ready is
        # unreliable on the experimental axon platform)
        np.asarray(res.info.status_val)
        return res

    fallback = None
    try:
        res = run_sync()  # compile + warmup
    except Exception as e:  # noqa: BLE001 — resilience of the official run
        # safety net for the round-recorded number: if the polish path
        # fails on this backend (e.g. an unsupported batched LU), fall
        # back to the proven no-polish round-2 configuration rather than
        # reporting nothing
        if not settings.polish:
            raise
        fallback = f"nopolish ({type(e).__name__})"
        print(f"# polish path failed ({e!r}); falling back", flush=True)
        settings = settings.replace(polish=False, warmup_eps=1e-4)
        res = run_sync()
    solved = float(jnp.mean((res.info.status_val == qt.SOLVED).astype(jnp.float64)))

    # independent host-side oracle: the solutions must satisfy the ORIGINAL
    # problems' KKT conditions in numpy float64 — "solved" is a verified
    # claim, not a trusted status flag (the oracle of demo_mex.m:31-43).
    # Under padding, only the original coordinates are checked (the padded
    # tail is provably zero, tests/test_padding.py).
    x = np.asarray(res.x)[:, :n]
    y = np.asarray(res.y)[:, :m]
    An = np.asarray(problems_orig.A)
    Ax = np.einsum("bmn,bn->bm", An, x)
    rp = np.abs(Ax - np.clip(Ax + y, np.asarray(problems_orig.l),
                             np.asarray(problems_orig.u))).max(axis=1)
    rd = np.abs(np.einsum("bij,bj->bi", Q, x) + np.asarray(problems_orig.q)
                + np.einsum("bmn,bm->bn", An, y)).max(axis=1)
    oracle_ok = float(np.mean((rp <= 1.1e-6) & (rd <= 1.1e-6)))

    # best-of-reps timing: each rep runs the identical compiled program, so
    # rep-to-rep spread is host/frontend contention (measured up to ~2x on
    # axon), not work — min(dt) estimates the uncontended solve time.  The
    # spread is reported (timing_spread = max/min) so a noisy run is visible.
    reps = int(os.environ.get("QPDO_BENCH_REPS", 3))
    # probe the chip's matmul peak BEFORE the timed reps as well as after:
    # a single probe landing in a contended window under-measures the peak
    # (observed 0.056 vs the usual 0.23-0.28 TFLOPS) and makes MFU read > 1.
    # The bench-shape probe runs at the SOLVE shape (padded when padding is
    # on) so the MFU denominator matches the GEMMs that actually ran.
    peak_pre = measure_peak_tflops(bench_shape=(B, n_s, m_s))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = run_sync()
        times.append(time.perf_counter() - t0)
    dt = min(times)

    qps = B / dt
    mean_iters = float(jnp.mean(res.info.iterations))
    # per-phase split: the float32 warmup iterations skip the certificate
    # GEMMs and run refine_steps=1 — feeding each phase its own FLOP
    # formula replaces the old single-formula × mean_iters estimate
    warm_iters = float(jnp.mean(res.info.warmup_iterations))
    p2_iters = max(0.0, mean_iters - warm_iters)

    # ---- FLOP / MFU accounting ------------------------------------------
    peak_post = measure_peak_tflops(bench_shape=(B, n_s, m_s))
    # measured peak = best probe; NEVER overwritten below (round-2 flaw:
    # flooring used to replace the measurement, making MFU circular)
    peak = {k: max(peak_pre[k], peak_post[k]) for k in peak_pre}

    def total(certs_in_phase2: bool) -> float:
        # FLOPs counted at the SOLVE shape (n_s, m_s): padding does real
        # arithmetic, so achieved-TFLOPS reflects the work the chip did
        f = B * warm_iters * flops_per_iteration(
            n_s, m_s, settings.warmup_refine_steps, settings.kkt_update_rows,
            settings.anchor_every, with_certs=False,
            kkt_solver=settings.kkt_solver,
            kkt_ns_steps=settings.kkt_ns_steps,
            kkt_inv_refresh=settings.kkt_inv_refresh)
        f += B * p2_iters * flops_per_iteration(
            n_s, m_s, settings.refine_steps, settings.kkt_update_rows,
            settings.anchor_every, with_certs=certs_in_phase2,
            kkt_solver=settings.kkt_solver,
            kkt_ns_steps=settings.kkt_ns_steps,
            kkt_inv_refresh=settings.kkt_inv_refresh)
        if settings.polish:
            # two polish calls per solve: post-warmup + final
            f += B * 2 * polish_flops(n_s, m_s, settings.polish_refine)
        return f

    total_flops = total(True)
    total_flops_lower = total(False)
    achieved_tflops = total_flops / dt / 1e12
    lower_tflops = total_flops_lower / dt / 1e12
    # THE MFU STORY (one denominator, round-4 verdict item 4): the
    # headline "mfu" is achieved / bench-shape-achievable — the chained
    # batched formation GEMM probe AT THE SOLVE SHAPE is what this chip
    # can actually sustain on the GEMMs the solver issues, so that ratio
    # says how much of the attainable rate the full solver keeps after
    # control flow, non-GEMM ops and dependencies.  The chip-ceiling
    # ratio (vs the best probe of ANY shape, incl. chained 4096²) is
    # reported separately as "mfu_vs_chip_peak"; the gap between the two
    # denominators is the tile-shape penalty, not solver inefficiency.
    # Only if a probe reads below the solver's own lower-bound FLOP rate
    # is the denominator floored — flagged, never overwriting a number.
    peak_shape = max(peak.get("f32_bench_shape", 0.0),
                     peak.get("f32_bench_shape_chained", 0.0))
    if settings.kkt_solver == "ns":
        # the ns solve's FLOPs are dominated by square (B,n,n) GEMMs,
        # not the formation shape — use the better-matching probe
        peak_shape = max(peak_shape,
                         peak.get("f32_ns_shape_chained", 0.0))
    peak_probe = max(peak["f32_highest"], peak_shape,
                     peak.get("f32_highest_chained", 0.0))
    peak_floored = peak_shape < lower_tflops
    peak_used = max(peak_shape, lower_tflops)
    mfu_raw = achieved_tflops / peak_used
    mfu_lower = lower_tflops / peak_used
    # with-certs numerator over a lower-bound-floored denominator can
    # read > 1; that is probe undershoot, not >100% utilization — clamp
    # and flag rather than print an impossible number
    mfu = min(mfu_raw, 1.0)
    mfu_chip = achieved_tflops / max(peak_probe, lower_tflops)

    # the bench config (warmup_refine_steps=0, mu_min=1e-7) differs from
    # the library defaults (1 / 1e-9, fuzz- and conditioning-conservative):
    # ALWAYS measure the library-default row too (round-3/4 verdict
    # demand) so the JSON carries both numbers; opt out with
    # QPDO_BENCH_LIBDEFAULT=0 for quick probe runs
    qps_libdefault = None
    if os.environ.get("QPDO_BENCH_LIBDEFAULT", "1") == "1":
        settings_lib = settings.replace(warmup_refine_steps=1,
                                        mu_min=1e-9)

        def run_lib():
            r = _solve_batch_compact(problems, settings_lib, None, None,
                                     False, False)
            np.asarray(r.info.status_val)
            return r

        run_lib()  # compile
        lib_times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run_lib()
            lib_times.append(time.perf_counter() - t0)
        qps_libdefault = B / min(lib_times)

    baseline = 10_000.0  # north-star QPs/s/chip (BASELINE.json)
    print(json.dumps({
        "metric": "batched_qp_throughput_n100_m150_eps1e-6",
        "value": round(qps, 2),
        "unit": "QPs/s/chip",
        "vs_baseline": round(qps / baseline, 6),
        "solved_fraction": round(solved, 4),
        "batch": B,
        "mean_iters": round(mean_iters, 2),
        "warmup_mean_iters": round(warm_iters, 2),
        "phase2_mean_iters": round(p2_iters, 2),
        "achieved_tflops": round(achieved_tflops, 4),
        "achieved_tflops_lower": round(lower_tflops, 4),
        "peak_tflops_f32_highest": round(peak["f32_highest"], 3),
        "peak_tflops_bf16": round(peak["bf16"], 3),
        "peak_bench_shape_tflops": round(peak.get("f32_bench_shape", 0.0), 3),
        "peak_chained_tflops_f32": round(
            peak.get("f32_highest_chained", 0.0), 3),
        "peak_chained_tflops_bf16": round(peak.get("bf16_chained", 0.0), 3),
        "peak_chained_bench_shape": round(
            peak.get("f32_bench_shape_chained", 0.0), 3),
        "peak_chained_ns_shape": round(
            peak.get("f32_ns_shape_chained", 0.0), 3),
        "peak_pre_tflops_f32": round(peak_pre["f32_highest"], 3),
        "peak_post_tflops_f32": round(peak_post["f32_highest"], 3),
        "peak_pre_bench_shape": round(peak_pre.get("f32_bench_shape", 0.0), 3),
        "peak_post_bench_shape": round(peak_post.get("f32_bench_shape", 0.0), 3),
        "peak_used_tflops": round(peak_used, 3),
        "mfu": round(mfu, 4),
        "mfu_lower": round(mfu_lower, 4),
        "mfu_vs_chip_peak": round(mfu_chip, 4),
        "chip_peak_tflops": round(peak_probe, 3),
        **({"pad": [n_s, m_s]} if pad_env else {}),
        "oracle_verified_fraction": round(oracle_ok, 4),
        "oracle_max_res": round(float(max(rp.max(), rd.max())), 9),
        "timing_spread": round(max(times) / min(times), 3),
        "warmup_refine_steps": settings.warmup_refine_steps,
        **({"value_library_default": round(qps_libdefault, 2)}
           if qps_libdefault is not None else {}),
        **({"peak_floored_from_solver": True} if peak_floored else {}),
        **({"mfu_clamped_probe_undershoot": round(mfu_raw, 4)}
           if mfu_raw > 1.0 else {}),
        **({"fallback": fallback} if fallback else {}),
        **({"platform": platform} if platform else {}),
    }))


if __name__ == "__main__":
    main()
