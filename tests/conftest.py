"""Test configuration: run on CPU with float64 and 8 virtual devices.

Float64 on CPU is the correctness-parity configuration (the reference is a
double-precision C solver); TPU float32 behaviour is exercised separately in
the benchmark.  The 8 virtual devices let sharding/mesh tests run without TPU
hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment pre-registers a TPU platform via sitecustomize and pins
# JAX_PLATFORMS; override through the config (effective as long as no
# computation ran yet in this process).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# ---------------------------------------------------------------------------
# xdist crash-retry: the XLA-CPU compiler segfaults nondeterministically at
# high per-process jit-compile counts (CLAUDE.md; each test passes in
# isolation).  Without this hook a segfaulted worker reports its in-flight
# test as FAILED; instead, reschedule it (up to twice) on a fresh worker —
# pytest.ini's --max-worker-restart supplies the replacement workers.

_crash_retries = {}


def pytest_handlecrashitem(crashitem, report, sched):
    n = _crash_retries.get(crashitem, 0)
    if n < 2 and hasattr(sched, "mark_test_pending"):
        _crash_retries[crashitem] = n + 1
        sched.mark_test_pending(crashitem)
        report.outcome = "rerun"


def pytest_report_teststatus(report, config):
    if getattr(report, "outcome", None) == "rerun":
        return "rerun", "R", ("RERUN", {"yellow": True})
