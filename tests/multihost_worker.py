"""Worker process for the 2-process multihost test (see test_multihost.py).

Each process contributes 4 virtual CPU devices, forms a jax.distributed
cluster, assembles a globally-sharded batch from process-local shards, and
runs the lock-step batched solve across all 8 devices.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main(process_id: int, num_processes: int, port: str) -> None:
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import qpdo_tpu as qt
    from qpdo_tpu.parallel import multihost, solve_batch

    multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=num_processes, process_id=process_id)
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 4 * num_processes

    # every process generates ITS OWN local shard (different seeds)
    local_B, n, m = 4, 16, 12
    rng = np.random.default_rng(100 + process_id)
    M = rng.standard_normal((local_B, n, n))
    import jax.numpy as jnp
    local = qt.Problem(
        Q=jnp.asarray(np.einsum("bij,bkj->bik", M, M) / n + 0.1 * np.eye(n)),
        q=jnp.asarray(rng.standard_normal((local_B, n))),
        A=jnp.asarray(rng.standard_normal((local_B, m, n))),
        l=jnp.asarray(-rng.random((local_B, m))),
        u=jnp.asarray(rng.random((local_B, m))),
        c=jnp.zeros((local_B,)))

    mesh = multihost.global_mesh("batch")
    global_problems = multihost.distribute_batch(local, mesh)
    assert global_problems.q.shape[0] == local_B * num_processes

    res = solve_batch(global_problems, qt.Settings(max_iter=300))
    # each process checks the shards it can address
    st_local = [np.asarray(s.data)
                for s in res.info.status_val.addressable_shards]
    assert all((sd == qt.SOLVED).all() for sd in st_local)
    print(f"proc {process_id}: OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
