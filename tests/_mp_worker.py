"""Worker process for the multi-process distributed-runtime test.

Launched by tests/test_multiprocess.py as
``python tests/_mp_worker.py <coord_port> <process_id> <num_processes>
<outfile>``. Each process owns 4 virtual CPU devices; together they form
the same 8-device global mesh the single-process suite uses — the CPU
simulation of a 2-host TPU slice (SURVEY.md:274-276), exercising
jax.distributed.initialize + the DCN/coordinator path of
parallel/mesh.initialize_runtime for real.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    port, pid, nprocs, outfile = (sys.argv[1], int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])

    import jax

    jax.config.update("jax_enable_x64", True)

    from modppl_tpu.parallel.mesh import global_mesh, initialize_runtime

    initialize_runtime(coordinator_address=f"localhost:{port}",
                       num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from modppl_tpu.parallel.distributed import shardmap_resample_fn

    mesh = global_mesh(sp=1)
    n = 1024
    # deterministic global inputs, computable identically on every process
    rng = np.random.default_rng(42)
    lw_np = rng.standard_normal(n)
    lw_np = lw_np - np.logaddexp.reduce(lw_np)
    state_np = rng.standard_normal((n, 2))

    sharding = NamedSharding(mesh, P("dp", *([None] * 0)))
    lw = jax.make_array_from_callback(
        (n,), sharding, lambda idx: lw_np[idx])
    state = jax.make_array_from_callback(
        (n, 2), NamedSharding(mesh, P("dp", None)),
        lambda idx: state_np[idx])

    resample = shardmap_resample_fn(mesh)
    key = jax.random.PRNGKey(7)
    new_state, parents, log_total = resample(key, lw, state)

    parents_full = multihost_utils.process_allgather(parents, tiled=True)
    state_full = multihost_utils.process_allgather(new_state, tiled=True)

    if pid == 0:
        np.savez(outfile, parents=np.asarray(parents_full),
                 state=np.asarray(state_full),
                 log_total=np.asarray(log_total))
    multihost_utils.sync_global_devices("done")
    print(f"worker {pid} OK")


if __name__ == "__main__":
    main()
