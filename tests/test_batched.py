"""Batched (vmap) and mesh-sharded solving.

The reference has no batching at all (one instance per process,
``iLQG_mex.c:19-144``); these tests pin down the TPU-native contract: the
batched solver must give bit-identical results to per-instance solves, and
the sharded path must run on a multi-device mesh (8 virtual CPU devices,
SURVEY.md section 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ddp_generator_tpu as ddp
from ddp_generator_tpu.models import brachistochrone, car_parking
from ddp_generator_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def car_small():
    prob = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=60)
    opts = ddp.SolverOptions(max_iter=30)
    return prob, p, x0, opts


def _batch_inputs(x0, B, T, seed=0):
    rng = np.random.default_rng(seed)
    x0s = jnp.asarray(np.tile(np.asarray(x0), (B, 1)))
    u0s = jnp.asarray(0.1 * rng.standard_normal((B, T, 2)))
    return x0s, u0s


def test_vmap_matches_single(car_small):
    prob, p, x0, opts = car_small
    B, T = 4, 60
    x0s, u0s = _batch_inputs(x0, B, T)
    batched = ddp.make_batched_solver(prob, opts)
    sol_b = batched(x0s, u0s, p)
    single = ddp.make_solver(prob, opts)
    for b in range(B):
        sol_s = single(x0s[b], u0s[b], p)
        # Identical masked control flow => identical results
        np.testing.assert_allclose(sol_b.cost[b], sol_s.cost, rtol=1e-12)
        np.testing.assert_array_equal(sol_b.iterations[b], sol_s.iterations)
        np.testing.assert_array_equal(sol_b.status[b], sol_s.status)
        np.testing.assert_allclose(sol_b.us[b], sol_s.us, atol=1e-12)


def test_batched_instances_diverge_independently(car_small):
    """Instances accept/reject/converge on different iterations; masking must
    keep them independent."""
    prob, p, x0, opts = car_small
    B, T = 8, 60
    x0s, u0s = _batch_inputs(x0, B, T, seed=3)
    # mix in very different initial guesses so per-lane iteration counts
    # genuinely differ
    u0s = u0s.at[B // 2 :].multiply(8.0)
    batched = ddp.make_batched_solver(prob, opts)
    sol = batched(x0s, u0s, p)
    iters = np.asarray(sol.iterations)
    assert len(np.unique(iters)) > 1  # genuinely divergent control flow


@pytest.mark.parametrize("backpass", ["serial", "pallas"])
def test_lam_retry_inline_matches_deferred(backpass):
    """lam_retry='inline' (reference inner while, iLQG.c:261-284) and
    'deferred' (one attempt per body call) must give identical per-lane
    results -- same lambda/attempt sequences, different scheduling.  The
    workload is chosen to actually hit lambda-escalation retries."""
    prob = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=60)
    rng = np.random.default_rng(11)
    B, T = 8, 60
    x0s = np.tile(np.asarray(x0), (B, 1))
    # Aggressive u0 + FULL_DDP second-order f terms: measured to produce
    # non-PD Quu -> lambda-escalation retries on this workload (without
    # them every iteration accepts and the retry path is never exercised).
    u0s = 4.0 * rng.standard_normal((B, T, 2))
    kw = dict(max_iter=30, full_ddp=True, backpass_method=backpass)
    if backpass == "pallas":
        kw["linesearch_method"] = "pallas"
    sol_d = ddp.make_batched_solver(
        prob, ddp.SolverOptions(lam_retry="deferred", **kw))(x0s, u0s, p)
    sol_i = ddp.make_batched_solver(
        prob, ddp.SolverOptions(lam_retry="inline", **kw))(x0s, u0s, p)
    # The deferred run must actually exercise the retry path.
    assert int(np.asarray(sol_d.bp_retry_calls).sum()) > 0
    np.testing.assert_array_equal(np.asarray(sol_d.status),
                                  np.asarray(sol_i.status))
    np.testing.assert_array_equal(np.asarray(sol_d.iterations),
                                  np.asarray(sol_i.iterations))
    np.testing.assert_allclose(np.asarray(sol_d.cost),
                               np.asarray(sol_i.cost), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sol_d.lam),
                               np.asarray(sol_i.lam), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sol_d.us),
                               np.asarray(sol_i.us), atol=1e-12)


def test_stepwise_inline_below_matches_plain():
    """StepwiseSolver(inline_below=W): tail chunks run inline-retry chunk
    programs; per-lane results must equal the all-deferred solve exactly
    (cost/us to roundoff -- the two modes schedule identical per-lane
    sequences)."""
    prob = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=60)
    rng = np.random.default_rng(11)
    B, T = 16, 60
    x0s = np.tile(np.asarray(x0), (B, 1))
    u0s = 4.0 * rng.standard_normal((B, T, 2))  # retry-heavy workload
    o = ddp.SolverOptions(max_iter=30, full_ddp=True)
    plain = ddp.StepwiseSolver(prob, o, chunk=4, compact_levels=2,
                               min_compact_batch=4)(x0s, u0s, p)
    mixed = ddp.StepwiseSolver(prob, o, chunk=4, compact_levels=2,
                               min_compact_batch=4,
                               inline_below=8)(x0s, u0s, p)
    assert int(np.asarray(plain.bp_retry_calls).sum()) > 0
    np.testing.assert_array_equal(np.asarray(plain.status),
                                  np.asarray(mixed.status))
    np.testing.assert_array_equal(np.asarray(plain.iterations),
                                  np.asarray(mixed.iterations))
    np.testing.assert_allclose(np.asarray(plain.cost),
                               np.asarray(mixed.cost), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(plain.us),
                               np.asarray(mixed.us), atol=1e-12)


def test_stepwise_inline_below_under_mesh_matches_plain():
    """inline_below tail chunks must also work under shard_map (the inner
    retry while runs inside custom_vmap inside vmap inside shard_map)."""
    from ddp_generator_tpu.parallel.mesh import make_mesh

    prob = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=40)
    rng = np.random.default_rng(11)
    B, T = 16, 40
    x0s = np.tile(np.asarray(x0), (B, 1))
    u0s = 4.0 * rng.standard_normal((B, T, 2))
    o = ddp.SolverOptions(max_iter=20, full_ddp=True,
                          backpass_method="pallas",
                          linesearch_method="pallas")
    plain = ddp.StepwiseSolver(prob, o, chunk=4, compact_levels=1,
                               min_compact_batch=8)(x0s, u0s, p)
    meshed = ddp.StepwiseSolver(prob, o, chunk=4, compact_levels=1,
                                min_compact_batch=8, inline_below=8,
                                mesh=make_mesh())(x0s, u0s, p)
    np.testing.assert_array_equal(np.asarray(plain.status),
                                  np.asarray(meshed.status))
    np.testing.assert_array_equal(np.asarray(plain.iterations),
                                  np.asarray(meshed.iterations))
    np.testing.assert_allclose(np.asarray(plain.cost),
                               np.asarray(meshed.cost), rtol=1e-12)


def test_derivs_emitter_shared_matches_per_family():
    """The shared-primal-trace and per-family CM emitters are two codegen
    strategies for the SAME bundle; results agree to roundoff (per-family
    is the measured-12x-faster default, BASELINE.md round 4)."""
    prob = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=40)
    x0s, u0s = _batch_inputs(x0, 8, 40, seed=5)
    kw = dict(max_iter=20, backpass_method="pallas",
              linesearch_method="pallas")
    sol_pf = ddp.make_batched_solver(
        prob, ddp.SolverOptions(derivs_emitter="per-family", **kw))(
        x0s, u0s, p)
    sol_sh = ddp.make_batched_solver(
        prob, ddp.SolverOptions(derivs_emitter="shared", **kw))(
        x0s, u0s, p)
    np.testing.assert_array_equal(np.asarray(sol_pf.status),
                                  np.asarray(sol_sh.status))
    np.testing.assert_allclose(np.asarray(sol_pf.cost),
                               np.asarray(sol_sh.cost), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(sol_pf.us),
                               np.asarray(sol_sh.us), atol=1e-7)


def test_sharded_solver_runs_on_mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    prob = brachistochrone.brachistochrone()
    p, x0, u0 = brachistochrone.default_setup(40)
    opts = ddp.SolverOptions(
        max_iter=20, w_pen_init_f=40.0, w_pen_fact2=2.0, full_ddp=False
    )
    m = pmesh.make_mesh()
    solver = pmesh.make_sharded_solver(prob, opts, mesh=m)
    B = 16
    x0s = jnp.asarray(np.tile(np.asarray(x0), (B, 1)))
    u0s = jnp.asarray(np.tile(np.asarray(u0), (B, 1, 1)))
    sol, stats = solver(x0s, u0s, p)
    assert int(stats.n_instances) == B
    assert int(stats.n_success) == B
    np.testing.assert_allclose(np.asarray(sol.xs[:, -1, 0]), -4.0, atol=1e-5)
    # result really is sharded over the mesh
    assert len(sol.cost.sharding.device_set) == 8


def test_sharded_matches_unsharded():
    prob = brachistochrone.brachistochrone()
    p, x0, u0 = brachistochrone.default_setup(30)
    opts = ddp.SolverOptions(
        max_iter=15, w_pen_init_f=40.0, w_pen_fact2=2.0, full_ddp=False
    )
    B = 8
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.tile(np.asarray(x0), (B, 1)))
    u0s = jnp.asarray(-np.abs(rng.uniform(0.5, 1.5, (B, 30, 1))))
    sol_sh, _ = pmesh.make_sharded_solver(prob, opts)(x0s, u0s, p)
    sol_un = ddp.make_batched_solver(prob, opts)(x0s, u0s, p)
    np.testing.assert_allclose(sol_sh.cost, sol_un.cost, rtol=1e-10)


def test_batched_params(car_small):
    """Per-instance parameter pytrees (multi-problem batch)."""
    prob, p, x0, opts = car_small
    B, T = 4, 60
    x0s, u0s = _batch_inputs(x0, B, T)
    ps = {k: jnp.asarray(np.tile(np.asarray(v, np.float64), (B,) + (1,) * np.ndim(v)))
          for k, v in p.items()}
    # vary the wheel-angle limit per instance
    ps["limW"] = jnp.asarray([[-0.5, 0.5], [-0.4, 0.4], [-0.3, 0.3], [-0.2, 0.2]])
    batched = ddp.make_batched_solver(prob, opts, batch_params=True)
    sol = batched(x0s, u0s, ps)
    w_max = np.max(np.abs(np.asarray(sol.us[..., 0])), axis=1)
    for b, lim in enumerate([0.5, 0.4, 0.3, 0.2]):
        assert w_max[b] <= lim + 1e-12


def test_stepwise_matches_batched(car_small):
    prob, p, x0, opts = car_small
    x0s, u0s = _batch_inputs(x0, 8, 60)
    want = ddp.make_batched_solver(prob, opts)(x0s, u0s, p)
    got = ddp.make_stepwise_solver(prob, opts, chunk=4)(x0s, u0s, p)
    np.testing.assert_array_equal(np.asarray(got.cost), np.asarray(want.cost))
    np.testing.assert_array_equal(
        np.asarray(got.iterations), np.asarray(want.iterations)
    )
    np.testing.assert_array_equal(np.asarray(got.us), np.asarray(want.us))


def test_stepwise_compaction_bit_identical(car_small):
    """Active-lane compaction must not change any lane's result: per-lane
    iteration counts diverge (different u0 seeds), so late chunks run with
    shrunken working sets when min_compact_batch allows it."""
    prob, p, x0, opts = car_small
    x0s, u0s = _batch_inputs(x0, 16, 60, seed=3)
    ref = ddp.StepwiseSolver(prob, opts, chunk=2, compact_levels=0)(
        x0s, u0s, p
    )
    got = ddp.StepwiseSolver(
        prob, opts, chunk=2, compact_levels=3, min_compact_batch=2
    )(x0s, u0s, p)
    np.testing.assert_array_equal(np.asarray(got.cost), np.asarray(ref.cost))
    np.testing.assert_array_equal(
        np.asarray(got.iterations), np.asarray(ref.iterations)
    )
    np.testing.assert_array_equal(np.asarray(got.us), np.asarray(ref.us))
    np.testing.assert_array_equal(
        np.asarray(got.status), np.asarray(ref.status)
    )


def test_stepwise_pipeline_depth_bit_identical(car_small):
    """The pipelined active-count sync (deque lag of ``pipeline_depth``
    chunks) only changes WHEN the host learns lanes are done, never the
    lane math — results must equal the synchronous depth=1 path."""
    prob, p, x0, opts = car_small
    x0s, u0s = _batch_inputs(x0, 12, 60, seed=7)
    ref = ddp.make_stepwise_solver(prob, opts, chunk=2, pipeline_depth=1)(
        x0s, u0s, p
    )
    got = ddp.make_stepwise_solver(prob, opts, chunk=2, pipeline_depth=4)(
        x0s, u0s, p
    )
    np.testing.assert_array_equal(np.asarray(got.cost), np.asarray(ref.cost))
    np.testing.assert_array_equal(
        np.asarray(got.iterations), np.asarray(ref.iterations)
    )
    np.testing.assert_array_equal(np.asarray(got.us), np.asarray(ref.us))
    np.testing.assert_array_equal(
        np.asarray(got.status), np.asarray(ref.status)
    )


def test_stepwise_compaction_batched_params(car_small):
    prob, p, x0, opts = car_small
    B = 12
    x0s, u0s = _batch_inputs(x0, B, 60, seed=5)
    pb = {k: jnp.asarray(np.tile(np.asarray(v), (B,) + (1,) * np.ndim(v)))
          for k, v in p.items()}
    ref = ddp.StepwiseSolver(
        prob, opts, chunk=2, batch_params=True, compact_levels=0
    )(x0s, u0s, pb)
    got = ddp.StepwiseSolver(
        prob, opts, chunk=2, batch_params=True, compact_levels=2,
        min_compact_batch=3,
    )(x0s, u0s, pb)
    np.testing.assert_array_equal(np.asarray(got.cost), np.asarray(ref.cost))
    np.testing.assert_array_equal(np.asarray(got.us), np.asarray(ref.us))


def test_sharded_solver_batched_params():
    """Batched params must be sharded along the instance axis with the batch
    (mesh.py param_sharding path)."""
    prob = brachistochrone.brachistochrone()
    p, x0, u0 = brachistochrone.default_setup(30)
    opts = ddp.SolverOptions(
        max_iter=15, w_pen_init_f=40.0, w_pen_fact2=2.0, full_ddp=False
    )
    B = 8
    x0s = jnp.asarray(np.tile(np.asarray(x0), (B, 1)))
    u0s = jnp.asarray(np.tile(np.asarray(u0), (B, 1, 1)))
    pb = {k: jnp.asarray(np.tile(np.asarray(v, np.float64), (B,) + (1,) * np.ndim(v)))
          for k, v in p.items()}
    solver = pmesh.make_sharded_solver(prob, opts, batch_params=True)
    sol, stats = solver(x0s, u0s, pb)
    assert int(stats.n_success) == B
    assert len(sol.cost.sharding.device_set) == 8
    # matches the unsharded batched-params result
    want = ddp.make_batched_solver(prob, opts, batch_params=True)(x0s, u0s, pb)
    np.testing.assert_allclose(np.asarray(sol.cost), np.asarray(want.cost),
                               rtol=1e-10)
