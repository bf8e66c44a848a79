"""Production-path mesh integration: StepwiseSolver (chunking + compaction +
Pallas kernels + staged line search) under shard_map on an 8-device mesh.

Round-2 verdict gap: the throughput configuration had no mesh support and
Pallas custom_vmap partitioning under GSPMD was unproven.  Under shard_map
partitioning is structural -- each device traces its LOCAL shard through the
kernels -- and the compiled chunk program is asserted collective-free below.

Per-lane results are semantically identical meshed/unmeshed; XLA codegen at
different shard widths differs by ~1 ulp on CPU (fma contraction), so cost
comparisons use rtol=1e-12 while integer observables must match exactly.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np

import ddp_generator_tpu as ddp
from ddp_generator_tpu.models import car_parking
from ddp_generator_tpu.parallel.mesh import make_mesh


def _workload(B=16, T=30):
    problem = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=T, seed=0)
    rng = np.random.default_rng(7)
    x0s = np.tile(np.asarray(x0), (B, 1))
    u0s = 0.1 * rng.standard_normal((B, T, 2))
    return problem, p, x0s, u0s


def _bench_options(**kw):
    return ddp.SolverOptions(
        max_iter=25, backpass_method="pallas", linesearch_method="pallas",
        debug_level=0, **kw,
    )


def test_mesh_stepwise_matches_unmeshed_production_config():
    problem, p, x0s, u0s = _workload()
    o = _bench_options()
    mesh = make_mesh()
    assert mesh.devices.size == 8
    got = ddp.StepwiseSolver(problem, o, chunk=5, compact_levels=1,
                             min_compact_batch=8, mesh=mesh)(x0s, u0s, p)
    want = ddp.StepwiseSolver(problem, o, chunk=5, compact_levels=1,
                              min_compact_batch=8)(x0s, u0s, p)
    assert np.asarray(got.success).all()
    np.testing.assert_array_equal(np.asarray(got.iterations),
                                  np.asarray(want.iterations))
    np.testing.assert_array_equal(np.asarray(got.status),
                                  np.asarray(want.status))
    np.testing.assert_allclose(np.asarray(got.cost), np.asarray(want.cost),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got.us), np.asarray(want.us),
                               atol=1e-9)


def test_mesh_chunk_program_has_no_collectives():
    """The per-chunk device program must be embarrassingly parallel over the
    batch: no all-gather/all-to-all/collective-permute (the round-2 concern
    was GSPMD gathering the (N, C, B) bundle onto one device).  The ONE
    allowed collective is the fused active-lane count -- a scalar integer
    all-reduce (per-shard partial + psum inside the shard_map'd program);
    any all-reduce with a non-scalar operand is a regression."""
    problem, p, x0s, u0s = _workload()
    o = _bench_options()
    mesh = make_mesh()
    s = ddp.StepwiseSolver(problem, o, chunk=5, mesh=mesh)
    carry_sd = jax.eval_shape(s._init, x0s, u0s, p)
    carry0 = jax.tree_util.tree_map(
        lambda sd: jnp.zeros(sd.shape, sd.dtype), carry_sd
    )
    txt = s._chunk.lower(carry0, p).compile().as_text()
    for coll in ("all-gather", "all-to-all", "collective-permute"):
        assert coll not in txt, f"chunk program contains {coll}"
    # Every all-reduce must produce a scalar integer (the active count).
    for m in re.finditer(r"=\s*(\S+?)\s+all-reduce(?:-start|-done)?\(", txt):
        ty = m.group(1)
        assert re.fullmatch(r"\(?[su]\d+\[\]\)?", ty), (
            f"chunk program contains a non-scalar all-reduce: {ty}"
        )


def test_mesh_precompile_then_solve():
    problem, p, x0s, u0s = _workload()
    o = _bench_options()
    mesh = make_mesh()
    s = ddp.StepwiseSolver(problem, o, chunk=5, compact_levels=1,
                           min_compact_batch=8, mesh=mesh)
    dt = s.precompile(x0s, u0s, p)
    assert dt > 0.0
    sol = s(x0s, u0s, p)
    assert np.asarray(sol.success).all()


def test_unmeshed_precompile_then_solve():
    problem, p, x0s, u0s = _workload()
    o = _bench_options()
    s = ddp.StepwiseSolver(problem, o, chunk=5, compact_levels=1,
                           min_compact_batch=8)
    s.precompile(x0s, u0s, p)
    sol = s(x0s, u0s, p)
    assert np.asarray(sol.success).all()
