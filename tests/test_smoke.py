"""Pre-commit smoke gate: one tiny-shape test per production path, < ~2 min.

Run before EVERY commit (see CLAUDE.md):

    python -m pytest tests -m smoke -q

Exists because the full covering tests take many minutes in Pallas
interpret mode, which is how round 3 shipped a broken production path
(an unfinished bundle-layout refactor that only `test_cm_derivs` /
`test_mesh_stepwise` would have caught).  Every path that ships in the
bench/dryrun configuration has a lane here: serial core, batched
cm-derivs + Pallas backpass, staged Pallas line search, mesh-sharded
StepwiseSolver, boxQP, and the AL constraint machinery.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ddp_generator_tpu as ddp
from ddp_generator_tpu.models import brachistochrone, car_parking
from ddp_generator_tpu.ops.boxqp import boxqp
from ddp_generator_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.smoke


def _car(B=2, T=12, seed=3):
    problem = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=T, seed=0)
    rng = np.random.default_rng(seed)
    x0s = np.tile(np.asarray(x0), (B, 1))
    u0s = 0.1 * rng.standard_normal((B, T, 2))
    return problem, p, x0s, u0s


def test_smoke_serial_core():
    # L1 outer loop + scan backpass + serial line search (iLQG.c semantics).
    prob = brachistochrone.brachistochrone()
    p, x0, u0 = brachistochrone.default_setup(12)
    sol = ddp.solve(prob, x0, u0, p, ddp.SolverOptions(
        max_iter=40, w_pen_init_f=40.0, w_pen_fact2=2.0, full_ddp=False))
    assert bool(sol.success)
    assert abs(float(sol.xs[-1, 0]) + 4.0) < 1e-4  # hfe terminal constraint


def test_smoke_production_kernels_match_serial():
    # The bench configuration's device path: packed component-major derivs
    # emission -> Pallas backpass kernel + staged Pallas line search
    # (interpret mode on CPU).  Must be bit-comparable to the XLA path.
    problem, p, x0s, u0s = _car()
    o_ref = ddp.SolverOptions(max_iter=6)
    o_prod = o_ref.replace(
        backpass_method="pallas", linesearch_method="pallas")
    s_ref = ddp.make_batched_solver(problem, o_ref)(x0s, u0s, p)
    s_prod = ddp.make_batched_solver(problem, o_prod)(x0s, u0s, p)
    # The Pallas rollout substitutes asin & co (ops/pallas_math.py), so
    # costs agree to ~1e-5 vs the XLA transcendentals, not bitwise.
    np.testing.assert_allclose(
        np.asarray(s_ref.cost), np.asarray(s_prod.cost),
        rtol=1e-5, atol=1e-7)
    assert (np.asarray(s_ref.status) == np.asarray(s_prod.status)).all()


def test_smoke_mesh_stepwise():
    # StepwiseSolver (host-chunked production pipeline) under shard_map on
    # the 8-device CPU mesh with both Pallas kernels -- the dryrun config.
    problem, p, x0s, u0s = _car(B=8)
    o = ddp.SolverOptions(
        max_iter=6, backpass_method="pallas", linesearch_method="pallas",
        debug_level=0)
    mesh = make_mesh()
    got = ddp.StepwiseSolver(problem, o, chunk=3, mesh=mesh)(x0s, u0s, p)
    want = ddp.make_batched_solver(problem, o)(x0s, u0s, p)
    np.testing.assert_allclose(
        np.asarray(got.cost), np.asarray(want.cost), rtol=1e-12)
    assert (np.asarray(got.status) == np.asarray(want.status)).all()


def test_smoke_mesh_chunk_scalar_collective_only():
    # Compile-only (seconds): the mesh chunk program's ONLY collective is
    # the scalar-integer active-count all-reduce.  Round 4 shipped with the
    # covering test for this invariant red because it wasn't in the smoke
    # gate; it is now.
    import re

    problem, p, x0s, u0s = _car(B=8)
    o = ddp.SolverOptions(
        max_iter=6, backpass_method="pallas", linesearch_method="pallas",
        debug_level=0)
    s = ddp.StepwiseSolver(problem, o, chunk=3, mesh=make_mesh())
    carry_sd = jax.eval_shape(s._init, x0s, u0s, p)
    carry0 = jax.tree_util.tree_map(
        lambda sd: jnp.zeros(sd.shape, sd.dtype), carry_sd)
    txt = s._chunk.lower(carry0, p).compile().as_text()
    for coll in ("all-gather", "all-to-all", "collective-permute"):
        assert coll not in txt, f"chunk program contains {coll}"
    for m in re.finditer(r"=\s*(\S+?)\s+all-reduce(?:-start|-done)?\(", txt):
        assert re.fullmatch(r"\(?[su]\d+\[\]\)?", m.group(1)), (
            f"non-scalar all-reduce: {m.group(1)}")


def test_smoke_boxqp():
    # Projected-Newton boxQP (boxQP.c semantics): clamp + free solve.
    H = jnp.asarray([[2.0, 0.0], [0.0, 2.0]])
    g = jnp.asarray([-10.0, 1.0])  # unconstrained x = [5, -0.5]
    res = jax.jit(boxqp)(
        H, g, jnp.asarray([-1.0, -1.0]), jnp.asarray([1.0, 1.0]),
        jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(res.x), [1.0, -0.5], atol=1e-7)
    assert int(res.res) >= 1


def test_smoke_al_running_inequality():
    # Augmented-Lagrangian machinery (Ruxton inequality updates) on the
    # time-varying hli Brachistochrone variant (optDefBrachi_hli.mac).
    prob = brachistochrone.brachistochrone_hli()
    p, x0, u0 = brachistochrone.default_setup_hli(12)
    sol = ddp.solve(prob, x0, u0, p, ddp.SolverOptions(
        max_iter=40, w_pen_init_f=40.0, w_pen_init_l=10.0,
        w_pen_fact2=2.0, full_ddp=False))
    assert bool(sol.success)
    ymin = np.asarray(p["ymin"])[: sol.xs.shape[0]]
    assert (np.asarray(sol.xs[:, 0]) >= ymin - 1e-3).all()
