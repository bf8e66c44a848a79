"""Two-process ``jax.distributed`` exercise of the multi-host path.

Spawns two real processes (GLOO collectives over localhost), each owning 4
virtual CPU devices of one global 8-device mesh, runs the sharded batched
solver across them through ``parallel.mesh.multihost_initialize`` +
``make_sharded_solver``, and asserts per-lane cost equality against the
single-process solve (SURVEY.md section 4: mesh/psum code paths in CI;
VERDICT round 1, missing item 2).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import ddp_generator_tpu as ddp
from ddp_generator_tpu.models import brachistochrone

HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.mark.slow
def test_two_process_sharded_solve(tmp_path):
    port = str(19700 + os.getpid() % 200)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mp_worker.py"),
             str(pid), "2", port, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (
            f"worker failed:\n{out.decode()[-2000:]}\n{err.decode()[-2000:]}"
        )

    results = []
    for pid in range(2):
        with open(os.path.join(str(tmp_path), f"result_{pid}.json")) as fh:
            results.append(json.load(fh))

    B = 8
    assert all(r["n_global_devices"] == 8 for r in results)
    # reduced stats are replicated across processes
    assert results[0]["n_success"] == results[1]["n_success"] == B
    assert results[0]["mean_cost"] == pytest.approx(results[1]["mean_cost"])

    # reassemble the per-lane costs from both processes' shards
    def reassemble(key):
        costs = np.full(B, np.nan)
        for r in results:
            for shard in r[key]:
                vals = np.asarray(shard["costs"])
                costs[shard["start"]:shard["start"] + len(vals)] = vals
        assert not np.isnan(costs).any()
        return costs

    costs = reassemble("local")
    costs_stepwise = reassemble("local_stepwise")

    # must equal the single-process batched solve
    prob = brachistochrone.brachistochrone()
    p, x0, u0 = brachistochrone.default_setup(30)
    opts = ddp.SolverOptions(
        max_iter=15, w_pen_init_f=40.0, w_pen_fact2=2.0, full_ddp=False
    )
    rng = np.random.default_rng(0)
    x0s = np.tile(np.asarray(x0), (B, 1))
    u0s = -np.abs(rng.uniform(0.5, 1.5, (B, 30, 1)))
    want = ddp.make_batched_solver(prob, opts)(x0s, u0s, p)
    np.testing.assert_allclose(costs, np.asarray(want.cost), rtol=1e-10)
    # The production path (StepwiseSolver + compaction + Pallas kernels +
    # staged line search, sharded across the two processes) must agree too
    # (pallas_math transcendental substitutions differ at roundoff).
    np.testing.assert_allclose(costs_stepwise, np.asarray(want.cost),
                               rtol=1e-6)
