"""Micro-batching solver service — the production serving runtime.

The reference's serving story is a process-global workspace behind a MEX
singleton (interfaces/mex/qpdo_mex.c:22); the TPU-native equivalent is a
service that turns an arbitrary stream of QP requests into lock-step
batched device solves:

- requests queue up; a worker drains them in micro-batches (up to
  ``max_batch``, waiting at most ``max_wait_ms`` for stragglers),
- higher-``priority`` requests are served first (FIFO within a priority),
- problems are padded to shape buckets (utils/padding.py) so a handful of
  compiled programs cover arbitrary sizes,
- warm-started and cold requests batch separately (their init paths
  differ), as do requests carrying per-request ``settings`` overrides
  (settings are jit-static, so each distinct override is its own
  compiled program — overrides are for the occasional special request,
  not per-request variation),
- callers get ``concurrent.futures.Future``s; results are exactly those of
  the equivalent direct ``solve`` call (padding is inert),
- ``stats()`` exposes counters (submitted/completed/failed, per-status
  totals, batch count and mean size, queue depth, latency) for
  monitoring.

Single device, single worker; scale-out across chips is the caller's
choice of ``parallel.solve_batch_sharded`` instead.
"""

from __future__ import annotations

import queue
import threading
from collections import OrderedDict
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import jax

from .parallel.batch import _solve_batch
from .types import Problem, Result, Settings
from .utils.padding import pad_problem, unpad_result, _round_up


@dataclass
class _Request:
    problem: Problem
    x0: object
    y0: object
    future: Future
    shape: Tuple[int, int]
    settings: Optional[Settings] = None
    t_submit: float = 0.0
    session: Optional[str] = None


@dataclass(order=True)
class _Prioritized:
    """PriorityQueue entry: min-heap on (-priority, seq) — higher priority
    first, FIFO within a priority level."""
    neg_priority: int
    seq: int
    request: _Request = field(compare=False)


class SolverService:
    """Threaded micro-batching QP solver front-end."""

    def __init__(self, settings: Optional[Settings] = None,
                 max_batch: int = 64, max_wait_ms: float = 5.0,
                 n_mult: int = 32, m_mult: int = 32,
                 max_pending: int = 1024, max_sessions: int = 1024,
                 mesh=None, mesh_axis: str = "batch"):
        self._settings = settings or Settings()
        # optional jax.sharding.Mesh: micro-batches whose size is a
        # multiple of the mesh size are padded to it and sharded over the
        # devices (parallel.solve_batch_sharded) — one service in front of
        # a multi-chip slice instead of one per chip
        self._mesh = mesh
        self._mesh_axis = mesh_axis
        # per-session warm-start cache (LRU-bounded): the serving analogue
        # of the reference's long-lived MEX workspace whose iterate
        # survives across solves (qpdo_mex.c:22 + qpdo_warm_start,
        # qpdo.c:217-299), keyed per client session for MPC-style streams
        self._sessions: "OrderedDict[str, tuple]" = OrderedDict()
        self._max_sessions = max_sessions
        self._max_batch = max_batch
        self._max_wait = max_wait_ms / 1000.0
        self._n_mult = n_mult
        self._m_mult = m_mult
        # Bounded queue = backpressure: submit() blocks (or raises, see
        # ``block``) once max_pending requests are in flight instead of
        # letting an overload grow memory without bound.
        self._queue: "queue.PriorityQueue[_Prioritized]" = \
            queue.PriorityQueue(maxsize=max_pending)
        self._lock = threading.Lock()
        self._seq = 0
        self._stop = threading.Event()
        self._stats = {"submitted": 0, "completed": 0, "failed": 0,
                       "batches": 0, "batched_requests": 0,
                       "latency_sum_s": 0.0, "by_status": {},
                       "session_warm_hits": 0}
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- client API --------------------------------------------------------

    def submit(self, problem: Problem, x0=None, y0=None, *,
               settings: Optional[Settings] = None, priority: int = 0,
               session: Optional[str] = None, block: bool = True,
               timeout: Optional[float] = None) -> Future:
        """Enqueue a QP; returns a Future[Result].

        ``settings`` overrides the service-wide settings for this request
        (each distinct override compiles its own program — use sparingly).
        Higher ``priority`` requests are dequeued first (FIFO within a
        level).  With ``block=False`` (or on ``timeout``), a full queue
        raises ``queue.Full`` instead of waiting — callers can shed
        load.

        ``session`` names a warm-start stream: when no explicit ``x0/y0``
        is given, the request warm-starts from the session's last SOLVED
        solution of matching dimensions (an MPC client re-solving a
        drifting problem typically converges in ~0 iterations, see
        examples/batched_mpc.py), and its own solution updates the cache
        on completion.  Sequential use (wait for each result before the
        next submit) gets the hits; concurrent same-session submits are
        safe but may cold-start."""
        import time
        if session is not None and x0 is None and y0 is None:
            with self._lock:
                cached = self._sessions.get(session)
                if cached is not None and cached[0].shape[0] == problem.n \
                        and cached[1].shape[0] == problem.m:
                    x0, y0 = cached
                    self._sessions.move_to_end(session)
                    self._stats["session_warm_hits"] += 1
        fut: Future = Future()
        req = _Request(problem=problem, x0=x0, y0=y0, future=fut,
                       shape=(problem.n, problem.m), settings=settings,
                       t_submit=time.perf_counter(), session=session)
        # The lock makes submit/shutdown atomic: once shutdown() has set
        # the stop event (under this lock), no request can be enqueued
        # afterwards, so the worker's final drain serves every admitted
        # Future and none is stranded.
        with self._lock:
            if self._stop.is_set():
                raise RuntimeError("service is shut down")
            self._seq += 1
            self._queue.put(_Prioritized(-priority, self._seq, req),
                            block=block, timeout=timeout)
            self._stats["submitted"] += 1
        return fut

    def solve(self, problem: Problem, x0=None, y0=None,
              timeout: Optional[float] = None) -> Result:
        """Blocking convenience wrapper."""
        return self.submit(problem, x0, y0).result(timeout)

    def shutdown(self, wait: bool = True) -> None:
        with self._lock:
            self._stop.set()
        if wait:
            self._worker.join()

    def stats(self) -> dict:
        """Monitoring snapshot: request/batch counters, per-status totals,
        current queue depth, mean batch size and mean submit->result
        latency."""
        with self._lock:
            s = dict(self._stats)
            s["by_status"] = dict(self._stats["by_status"])
        s["queue_depth"] = self._queue.qsize()
        s["mean_batch_size"] = (s.pop("batched_requests") / s["batches"]
                                if s["batches"] else 0.0)
        s["mean_latency_s"] = (s.pop("latency_sum_s") / s["completed"]
                               if s["completed"] else 0.0)
        return s

    # -- worker ------------------------------------------------------------

    def _drain_nowait(self) -> list:
        out = []
        while True:
            try:
                out.append(self._queue.get_nowait().request)
            except queue.Empty:
                return out

    def _collect(self) -> Tuple[Sequence[_Request], bool]:
        """Block for one request, then drain up to max_batch within the
        micro-batching window.  Returns (batch, stop).  After shutdown,
        anything still queued (admitted before the stop event) is drained
        and served so no Future is stranded."""
        import time
        while True:
            try:
                first = self._queue.get(timeout=0.05).request
                break
            except queue.Empty:
                if self._stop.is_set():
                    # re-check the queue *after* seeing the stop event: a
                    # submit that won the race enqueued before stop was set
                    return self._drain_nowait(), True
        batch = [first]
        deadline = time.perf_counter() + self._max_wait
        while len(batch) < self._max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining).request)
            except queue.Empty:
                break
        return batch, False

    def _run(self) -> None:
        while True:
            batch, stop = self._collect()
            if batch:
                try:
                    self._dispatch(batch)
                except Exception as e:  # pragma: no cover - defensive
                    for req in batch:
                        if not req.future.done():
                            with self._lock:
                                self._stats["failed"] += 1
                            req.future.set_exception(e)
            if stop:
                return

    def _dispatch(self, batch: Sequence[_Request]) -> None:
        import jax.numpy as jnp

        import time

        # group by (padded shape, dtype, warm-ness, settings override):
        # init paths and settings are jit-static, and stacking mixed
        # dtypes would silently promote
        groups = {}
        for req in batch:
            key = (_round_up(req.shape[0], self._n_mult),
                   _round_up(req.shape[1], self._m_mult),
                   str(req.problem.Q.dtype),
                   req.x0 is not None, req.y0 is not None,
                   req.settings)
            groups.setdefault(key, []).append(req)

        for (n_pad, m_pad, _dt, warm_x, warm_y, override), reqs \
                in groups.items():
            padded = [pad_problem(r.problem, n_pad, m_pad) for r in reqs]
            problems = jax.tree.map(lambda *xs: jnp.stack(xs), *padded)
            x0 = y0 = None
            if warm_x:
                x0 = jnp.stack([
                    jnp.zeros((n_pad,), problems.q.dtype).at[: r.shape[0]]
                    .set(jnp.asarray(r.x0)) for r in reqs])
            if warm_y:
                y0 = jnp.stack([
                    jnp.zeros((m_pad,), problems.q.dtype).at[: r.shape[1]]
                    .set(jnp.asarray(r.y0)) for r in reqs])
            if self._mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from .parallel.batch import shard_problems

                ndev = self._mesh.devices.size
                pad = (-len(reqs)) % ndev
                if pad:
                    # pad to the mesh size by repeating the last problem;
                    # the extra lanes are dropped below (k indexes reqs)
                    problems = jax.tree.map(
                        lambda a: jnp.concatenate(
                            [a, jnp.repeat(a[-1:], pad, axis=0)]), problems)
                    if x0 is not None:
                        x0 = jnp.concatenate(
                            [x0, jnp.repeat(x0[-1:], pad, axis=0)])
                    if y0 is not None:
                        y0 = jnp.concatenate(
                            [y0, jnp.repeat(y0[-1:], pad, axis=0)])
                problems = shard_problems(problems, self._mesh,
                                          self._mesh_axis)
                spec = NamedSharding(self._mesh, P(self._mesh_axis, None))
                if x0 is not None:
                    x0 = jax.device_put(x0, spec)
                if y0 is not None:
                    y0 = jax.device_put(y0, spec)
            res = _solve_batch(problems, override or self._settings,
                               x0, y0, warm_x, warm_y)
            now = time.perf_counter()
            with self._lock:
                self._stats["batches"] += 1
                self._stats["batched_requests"] += len(reqs)
            for k, req in enumerate(reqs):
                one = jax.tree.map(lambda a: a[k], res)
                out = unpad_result(one, req.shape[0], req.shape[1])
                status = str(out.info.status)
                with self._lock:
                    self._stats["completed"] += 1
                    self._stats["latency_sum_s"] += now - req.t_submit
                    by = self._stats["by_status"]
                    by[status] = by.get(status, 0) + 1
                    if req.session is not None and status == "solved":
                        import numpy as np
                        self._sessions[req.session] = (np.asarray(out.x),
                                                       np.asarray(out.y))
                        self._sessions.move_to_end(req.session)
                        while len(self._sessions) > self._max_sessions:
                            self._sessions.popitem(last=False)
                req.future.set_result(out)
