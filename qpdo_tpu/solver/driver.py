"""Host-side solve drivers: verbose iteration printing and max_time.

Two concerns that cannot live inside a single jitted while_loop are handled
by driving the jitted loop in chunks from the host:

- ``max_time`` (reference: the PROFILING wall-clock check, qpdo.c:442-448):
  the loop runs in chunks of iterations; between chunks the host checks the
  clock and installs MAX_TIME_REACHED.
- ``verbose`` (reference: print_iteration each iteration, qpdo.c:353-358):
  the loop runs one iteration per chunk, printing the same table as
  util.c:97-175.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp

from .. import constants as _c
from ..types import Result, ScaledProblem, Settings
from ..utils import printing
from . import core

_TIME_CHUNK = 32  # initial iterations between wall-clock checks
# Adaptive chunk bounds: on the axon frontend each host sync costs
# ~seconds, so a fixed 32-iteration chunk makes cheap-iteration solves
# (banded large-n ladders) sync-bound — the n=90k ladder timed out at
# 100 min.  Chunks grow while executions stay short and shrink when they
# exceed the target, keeping each device execution well under the
# worker's multi-minute-execution crash threshold (RESULTS.md).
_CHUNK_MAX = 2048
# QPDO_CHUNK_TARGET_S: per-device-execution wall target of the adaptive
# chunking.  The default 20 s balances host-sync cost against the
# platform's sustained-execution crash class; on sick chip days (round
# 5: level-22500 banded executions killed the worker on consecutive
# attempts) a smaller target trades sync overhead for gentler streams.
import os as _os

_CHUNK_TARGET_S = float(_os.environ.get("QPDO_CHUNK_TARGET_S", "20.0"))
# restore-retry bound: consecutive failed RESTORES (not attempts) allowed
# before giving up — each waits up to 5 min, so 8 ≈ an extra half hour of
# patience for a worker that answers subprocess probes but rejects
# reattach (the round-4 ladder-killer failure mode)
_RESTORE_MAX_FAILURES = 8


def _adapt_chunk(chunk: int, exec_s: float) -> int:
    if exec_s < 0.25 * _CHUNK_TARGET_S:
        return min(chunk * 2, _CHUNK_MAX)
    if exec_s > 2.0 * _CHUNK_TARGET_S:
        return max(_TIME_CHUNK, chunk // 2)
    return chunk


@functools.partial(jax.jit, static_argnames=("settings", "warm_x", "warm_y"))
def _init(sp, settings, x0, y0, warm_x, warm_y):
    import jax.numpy as jnp

    if settings.hybrid_warmup and core.as_operator(sp).dtype != jnp.float32:
        s = core._warmup_pass(sp, settings, x0, y0, warm_x, warm_y)
        # post-warmup polish (no-op unless settings.polish)
        return core.polish_state(sp, settings, s)
    s = core.init_state(sp, settings, x0, y0, warm_x, warm_y)
    if warm_x and warm_y:
        # warm-start pre-loop polish, matching core.solve_scaled
        s = core.polish_state(sp, settings, s)
    return s


@functools.partial(jax.jit, static_argnames=("settings",))
def _run_chunk(sp, settings, state, iter_cap):
    return core.run_loop(sp, settings, state, iter_cap)


@functools.partial(jax.jit,
                   static_argnames=("settings32", "warm_x", "warm_y"))
def _init32(op32, settings32, x0, y0, warm_x, warm_y):
    from ..operators import tcast
    x032 = None if x0 is None else tcast(x0, jnp.float32)
    y032 = None if y0 is None else tcast(y0, jnp.float32)
    return core.init_state(op32, settings32, x032, y032, warm_x, warm_y)


@functools.partial(jax.jit, static_argnames=("settings",))
def _upcast_polish(sp, settings, state):
    s = core.upcast_state(sp, settings, state)
    return core.polish_state(sp, settings, s)


@functools.partial(jax.jit, static_argnames=("settings",))
def _step(sp, settings, state):
    return core.step(sp, settings, state)


@functools.partial(jax.jit, static_argnames=("settings",))
def _reanchor(sp, settings, state):
    return core.reanchor(sp, settings, state)


def _mixed_mode(sp, settings) -> bool:
    import jax.numpy as jnp
    op = core.as_operator(sp)
    return (settings.phase2_gemm_dtype is not None
            and jnp.dtype(settings.phase2_gemm_dtype) != op.dtype
            and hasattr(op, "Amv_mixed"))


@functools.partial(jax.jit, static_argnames=("settings",))
def _finalize(sp, settings, state, unsolved_status):
    # final polish before assembling the result (no-op unless
    # settings.polish)
    state = core.polish_state(sp, settings, state)
    return core.finalize(sp, settings, state, unsolved_status)


@functools.partial(jax.jit, static_argnames=("settings",))
def _objective(sp, settings, state):
    return core.objective_value(sp, state.x, state.Qx)


def _host_tree(t):
    """Pull every array leaf of a pytree to host memory (crash snapshot)."""
    import numpy as np

    return jax.tree.map(
        lambda a: np.asarray(a) if hasattr(a, "dtype") else a, t)


def _device_tree(t):
    """Re-materialize a host snapshot as device arrays (crash restore)."""
    return jax.tree.map(
        lambda a: jnp.asarray(a) if hasattr(a, "dtype") else a, t)


def _recover_backend(max_wait_s: float = 1800.0) -> bool:
    """Best-effort client-side recovery after a device/worker crash.

    The platform fault class (RESULTS.md: sustained sparse-CG streams can
    take down the axon worker; re-init takes minutes) kills every live
    device buffer and poisons the in-process backend.  This waits until
    the platform answers a fresh-subprocess probe, then drops this
    process's backend state so the next dispatch re-initializes and
    recompiles.  Returns False if the wait was exhausted."""
    import subprocess
    import sys

    deadline = time.monotonic() + max_wait_s
    while True:
        try:
            ok = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=max(60.0, max_wait_s / 4),
            ).returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            break
        if time.monotonic() > deadline:
            return False
        time.sleep(30.0)
    try:
        jax.clear_backends()
    except Exception:  # noqa: BLE001 — clear_backends moved across versions
        try:
            from jax.extend import backend as _xb
            _xb.clear_backends()
        except Exception:  # noqa: BLE001
            pass
    return True


def solve_driven(sp: ScaledProblem, settings: Settings, x0, y0,
                 warm_x: bool, warm_y: bool, t_start: float) -> Result:
    """Chunked host-driven solve honouring ``verbose`` and ``max_time``.

    Semantically identical to ``core.solve_scaled`` (same jitted step), with
    printing/timeout layered on from the host.  Single problem only — for
    batches use the fully-jitted path.

    CRASH-RESILIENT SEGMENTATION (Settings.crash_recovery > 0): every
    chunk's completed state is snapshotted to host memory; if a chunk
    dies on a device/worker crash (the platform fault class of
    RESULTS.md), the driver waits for the backend to come back, restores
    the operator and state from the snapshots, and resumes — one
    recompile instead of a lost solve.  The reference's closest analogue
    is its supernodal→simplicial factorization fallback
    (cholmod_interface.c:19-29); elastic re-dispatch has no reference
    equivalent (single-process C).
    """
    verbose = settings.verbose
    timed_out = False

    recovery = int(getattr(settings, "crash_recovery", 0))
    sp_host = _host_tree(sp) if recovery > 0 else None

    def run_chunk_safe(op, op_host, chunk_settings, state, cap):
        """_run_chunk + forced completion, with crash restore/retry.
        Returns (op, state_after) — op is re-materialized on recovery.

        The restore itself (re-materializing host snapshots on-device) is
        a device operation and can ALSO die while the worker is still
        recovering — the round-4 n=90k ladder was lost exactly there
        (JaxRuntimeError escaping from the unprotected restore in the
        except handler).  So the restore runs INSIDE the protected loop:
        a failed restore re-probes the backend and retries with backoff,
        and only failed solve *attempts* consume a recovery credit."""
        nonlocal recovery
        snap = _host_tree(state) if recovery > 0 else None
        needs_restore = False
        restore_failures = 0
        while True:
            try:
                if needs_restore:
                    op = _device_tree(op_host)
                    state = _device_tree(snap)
                    needs_restore = False
                    restore_failures = 0
                out = _run_chunk(op, chunk_settings, state,
                                 jnp.asarray(cap, jnp.int32))
                int(out.status)  # force execution: crashes surface HERE
                return op, out
            except Exception as e:  # noqa: BLE001 — device loss is untyped
                if recovery <= 0 and not needs_restore:
                    raise
                if needs_restore:
                    # the RESTORE failed: the fresh-subprocess probe can
                    # pass while this process's reattach still fails, so
                    # back off and re-probe without spending a credit
                    restore_failures += 1
                    if restore_failures > _RESTORE_MAX_FAILURES:
                        raise
                    print(f"# state restore failed ({type(e).__name__}); "
                          f"backend still recovering — backoff "
                          f"{restore_failures}/{_RESTORE_MAX_FAILURES}",
                          flush=True)
                    time.sleep(min(30.0 * restore_failures, 300.0))
                else:
                    recovery -= 1
                    print(f"# device execution failed ({type(e).__name__});"
                          f" attempting backend recovery "
                          f"({recovery} retries left)", flush=True)
                if not _recover_backend():
                    raise
                needs_restore = True

    hybrid = (settings.hybrid_warmup
              and core.as_operator(sp).dtype != jnp.float32)
    if hybrid:
        # drive the float32 warmup in chunks too: a one-shot jitted
        # _warmup_pass runs up to max_iter/2 iterations that max_time
        # cannot interrupt (hours on slow paths — seen on the on-TPU
        # sparse fuzz campaign); here the same wall clock bounds phase 1
        op32 = core.as_operator(sp).cast(jnp.float32)
        s32_settings = core.warmup_settings(settings)
        s = _init32(op32, s32_settings, x0, y0, warm_x, warm_y)
        wcap = core.warmup_iter_cap(settings)
        chunk = _TIME_CHUNK
        op32_host = _host_tree(op32) if recovery > 0 else None
        while int(s.status) == _c.UNSOLVED and int(s.iter) < wcap:
            cap = min(int(s.iter) + chunk, wcap)
            t_c = time.perf_counter()
            op32, s = run_chunk_safe(op32, op32_host, s32_settings, s, cap)
            chunk = _adapt_chunk(chunk, time.perf_counter() - t_c)
            if time.perf_counter() - t_start > settings.max_time:
                timed_out = True
                break
        s = _upcast_polish(sp, settings, s)
    else:
        s = _init(sp, settings, x0, y0, warm_x, warm_y)

    # the single-step verbose loop bypasses run_loop's nested anchoring, so
    # re-anchor from the host at the same cadence in mixed-GEMM mode
    mixed = _mixed_mode(sp, settings)

    if verbose:
        printing.print_header()
        prev = s
        while (not timed_out and int(s.status) == _c.UNSOLVED
               and int(s.iter) < settings.max_iter):
            prev = s
            s = _step(sp, settings, s)
            if mixed and int(s.iter) % settings.anchor_every == 0:
                s = _reanchor(sp, settings, s)
            it = int(prev.iter)
            if it % settings.print_interval == 0:
                printing.print_iteration(
                    it, float(_objective(sp, settings, prev)),
                    float(s.res_prim_norm), float(s.res_dual_norm),
                    float(s.res_prim_in_norm), float(s.res_dual_in_norm),
                    float(prev.tau))
                if int(s.oter) > int(prev.oter):
                    capped = (int(prev.iter) - int(prev.iter_old)
                              == settings.inner_max_iter)
                    printing.print_subproblem_separator(it, capped)
            if time.perf_counter() - t_start > settings.max_time:
                timed_out = True
                break
    else:
        chunk = _TIME_CHUNK
        while (not timed_out and int(s.status) == _c.UNSOLVED
               and int(s.iter) < settings.max_iter):
            cap = min(int(s.iter) + chunk, settings.max_iter)
            t_c = time.perf_counter()
            sp, s = run_chunk_safe(sp, sp_host, settings, s, cap)
            chunk = _adapt_chunk(chunk, time.perf_counter() - t_c)
            if time.perf_counter() - t_start > settings.max_time:
                timed_out = True
                break

    unsolved = _c.MAX_TIME_REACHED if timed_out else _c.MAX_ITER_REACHED
    res = _finalize(sp, settings, s, jnp.asarray(unsolved, jnp.int32))

    if verbose:
        printing.print_final_message(
            int(res.info.status_val), float(res.info.res_prim_norm),
            float(res.info.res_dual_norm), settings.eps_abs,
            float(res.info.objective),
            run_time=time.perf_counter() - t_start)
    return res
