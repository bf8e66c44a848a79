"""Worker for the 2-process jax.distributed test (test_multiprocess.py).

Each process owns half the virtual CPU devices; together they form one
global mesh over which the batched solve is sharded.  Exercises
``parallel.mesh.multihost_initialize`` + ``make_sharded_solver`` across real
process boundaries (GLOO collectives on localhost), the pattern a TPU pod
slice uses across hosts (SURVEY.md section 5, distributed-communication row).
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out_dir = sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import numpy as np

    import ddp_generator_tpu as ddp
    from ddp_generator_tpu.models import brachistochrone
    from ddp_generator_tpu.parallel import mesh as pmesh

    # The framework's multi-host entry (jax.distributed.initialize wrapper).
    pmesh.multihost_initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    n_global = len(jax.devices())
    assert n_global == nproc * len(jax.local_devices())

    prob = brachistochrone.brachistochrone()
    p, x0, u0 = brachistochrone.default_setup(30)
    opts = ddp.SolverOptions(
        max_iter=15, w_pen_init_f=40.0, w_pen_fact2=2.0, full_ddp=False
    )
    B = 8
    rng = np.random.default_rng(0)
    x0s_full = np.tile(np.asarray(x0), (B, 1))
    u0s_full = -np.abs(rng.uniform(0.5, 1.5, (B, 30, 1)))

    mesh = pmesh.make_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P(pmesh.BATCH_AXIS))

    def globalize(full):
        return jax.make_array_from_callback(
            full.shape, shard, lambda idx: full[idx]
        )

    x0s = globalize(x0s_full)
    u0s = globalize(u0s_full)

    solver = pmesh.make_sharded_solver(prob, opts, mesh=mesh)
    sol, stats = solver(x0s, u0s, p)

    # Production throughput path across the same 2-process mesh:
    # StepwiseSolver (host-chunked, compaction) + Pallas kernels (interpret
    # on CPU) + staged line search under shard_map.  The host loops of both
    # processes stay in lockstep because the active count reduces to a
    # replicated scalar.
    prod_opts = opts.replace(backpass_method="pallas",
                             linesearch_method="pallas", debug_level=0)
    stepwise = ddp.StepwiseSolver(prob, prod_opts, chunk=4,
                                  compact_levels=1, min_compact_batch=8,
                                  mesh=mesh)
    sol2 = stepwise(x0s, u0s, p)

    def shard_dump(arr):
        shards = sorted(arr.addressable_shards, key=lambda s: s.index[0].start)
        return [
            {"start": int(s.index[0].start),
             "costs": np.asarray(s.data).tolist()}
            for s in shards
        ]

    result = {
        "pid": pid,
        "n_global_devices": n_global,
        "n_success": int(stats.n_success),
        "mean_cost": float(stats.mean_cost),
        "local": shard_dump(sol.cost),
        "local_stepwise": shard_dump(sol2.cost),
    }
    with open(os.path.join(out_dir, f"result_{pid}.json"), "w") as fh:
        json.dump(result, fh)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
