"""Shared helpers for the TPU Pallas kernels.

``x32_trace_scope``: Mosaic cannot lower 64-bit types, but under
``jax_enable_x64`` (the solver's f64-state configuration, i.e. the bench
itself) every Python-int literal inside a kernel — ref indices, fori_loop
bounds, BlockSpec index-map constants — canonicalizes to i64, producing
either the "failed to legalize func.return (i32, i64, i64)" Mosaic error
(index maps) or an infinite ``_convert_helper`` recursion (i64 converts
in the kernel body) — both observed killing the round-4 in-loop A/B
cells (logs/bench_r4h_pallas_*.log).  Tracing the ``pallas_call`` inside
this scope pins canonicalization to 32-bit for the whole kernel + index
maps; already-typed f32 operand tracers are unaffected.

Uses ``jax._src.config.enable_x64`` because JAX 0.9 exposes no public
scoped x64 switch (``jax.experimental.disable_x64`` was removed); the
regression test tests/test_pallas_inloop.py::
test_pallas_kernels_are_64bit_clean_under_x64 pins the behaviour, so a
future JAX bump that breaks this import fails loudly in CI.
"""

from __future__ import annotations

import contextlib

import numpy as np

from jax._src import config as _config


def x32_trace_scope(dtype=np.float32):
    """Context manager: trace-time 32-bit canonicalization (Mosaic-safe).

    Pass the kernel's operand dtype: for 64-bit kernels (the CPU
    interpret-mode path — Mosaic never sees f64) the scope is a no-op,
    because disabling x64 would demote the f64 kernel math itself."""
    if np.dtype(dtype).itemsize > 4:
        return contextlib.nullcontext()
    return _config.enable_x64(False)
