"""AOT export/load round-trips (``aot.py`` -- the ``make_iLQG.m`` build-driver
equivalent: compile once, reload without re-tracing)."""

import numpy as np
import pytest

import ddp_generator_tpu as ddp
from ddp_generator_tpu import aot
from ddp_generator_tpu.models import brachistochrone, car_parking


def _setup(T=16):
    problem = car_parking.car_parking()
    p, x0, u0 = car_parking.default_setup(T=T, seed=0)
    return problem, p, np.asarray(x0), np.asarray(u0)


def test_roundtrip_single_instance():
    problem, p, x0, u0 = _setup()
    o = ddp.SolverOptions(max_iter=3, dtype="float64")
    blob = aot.export_solver(problem, o, horizon=u0.shape[0], params=p)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0

    restored = aot.load_solver(blob)
    got = restored(x0, u0, p)
    want = ddp.solve(problem, x0, u0, p, o)
    np.testing.assert_allclose(
        np.asarray(got.cost), np.asarray(want.cost), rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(got.us), np.asarray(want.us))
    assert int(got.iterations) == int(want.iterations)


def test_symbolic_batch_dim():
    problem, p, x0, u0 = _setup(T=8)
    o = ddp.SolverOptions(max_iter=2, dtype="float64")
    blob = aot.export_solver(
        problem, o, horizon=8, params=p, batch="B"
    )
    restored = aot.load_solver(blob)
    for B in (1, 3):
        x0s = np.tile(x0, (B, 1))
        u0s = np.tile(u0, (B, 1, 1))
        got = restored(x0s, u0s, p)
        assert got.cost.shape == (B,)
        ref = ddp.make_batched_solver(problem, o)(x0s, u0s, p)
        np.testing.assert_allclose(
            np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-12
        )


def test_save_solver_incremental(tmp_path):
    problem = brachistochrone.brachistochrone()
    p, x0, u0 = brachistochrone.default_setup(n=4)
    o = ddp.SolverOptions(max_iter=2, dtype="float64")
    path = str(tmp_path / "brachi.ddpexe")
    wrote = aot.save_solver(
        path, problem, o, horizon=u0.shape[0], params=p
    )
    assert wrote
    # Fresh artifact => skipped, like make_iLQG.m:30-37.
    assert not aot.save_solver(path, problem, o, horizon=u0.shape[0], params=p)
    assert aot.save_solver(
        path, problem, o, horizon=u0.shape[0], params=p, force=True
    )
    restored = aot.load_solver_file(path)
    got = restored(np.asarray(x0), np.asarray(u0), p)
    want = ddp.solve(problem, np.asarray(x0), np.asarray(u0), p, o)
    np.testing.assert_allclose(
        np.asarray(got.cost), np.asarray(want.cost), rtol=1e-12
    )


def test_shape_mismatch_rejected():
    problem, p, x0, u0 = _setup(T=8)
    o = ddp.SolverOptions(max_iter=1, dtype="float64")
    restored = aot.load_solver(
        aot.export_solver(problem, o, horizon=8, params=p)
    )
    bad_u = np.zeros((9, 2))  # wrong horizon, like iLQG_mex.c:39-43 dim check
    with pytest.raises(Exception):
        np.asarray(restored(x0, bad_u, p).cost)


def test_roundtrip_bench_configuration_fixed_batch():
    """The bench configuration (pallas backpass + staged pallas line search)
    exports and round-trips at a FIXED batch (round-2 verdict item 7).  On
    CPU the kernels lower in interpret mode (plain StableHLO); on TPU the
    export carries tpu_custom_call with the safety check disabled."""
    problem, p, x0, u0 = _setup()
    o = ddp.SolverOptions(max_iter=4, dtype="float64",
                          backpass_method="pallas",
                          linesearch_method="pallas")
    B = 3
    rng = np.random.default_rng(0)
    x0s = np.tile(x0, (B, 1))
    u0s = 0.1 * rng.standard_normal((B,) + u0.shape)
    blob = aot.export_solver(problem, o, horizon=u0.shape[0], params=p,
                             batch=B)
    restored = aot.load_solver(blob)
    got = restored(x0s, u0s, p)
    want = ddp.make_batched_solver(problem, o)(x0s, u0s, p)
    np.testing.assert_allclose(np.asarray(got.cost), np.asarray(want.cost),
                               rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(got.iterations),
                                  np.asarray(want.iterations))


def test_symbolic_batch_with_pallas_rejected():
    problem, p, x0, u0 = _setup()
    o = ddp.SolverOptions(max_iter=2, backpass_method="pallas")
    with pytest.raises(ValueError, match="symbolic"):
        aot.export_solver(problem, o, horizon=u0.shape[0], params=p,
                          batch="B")
