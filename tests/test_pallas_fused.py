"""Fused derivs+backpass kernel vs calc_derivs + back_pass (interpret mode).

The fused kernel computes the derivative bundle on the fly inside the
backward recursion (ops/pallas_fused.py).  Measured on v5e it is slower than
the separate calc_derivs + pallas backpass (Mosaic's codegen for the
in-kernel nested-jvp autodiff trails XLA's batched derivative pass), so it
is an experimental option -- but it must stay CORRECT.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ddp_generator_tpu as ddp
from ddp_generator_tpu.al import init_multipliers
from ddp_generator_tpu.derivs import calc_derivs
from ddp_generator_tpu.models import brachistochrone, car_parking
from ddp_generator_tpu.ops.backpass import back_pass
from ddp_generator_tpu.ops.pallas_fused import fused_derivs_back_pass
from ddp_generator_tpu.solver import _boxqp_hyper


@pytest.mark.parametrize("full_ddp", [True, False])
def test_fused_matches_separate(full_ddp):
    B, T = 4, 25
    dtype = jnp.float64
    problem = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=T, seed=0)
    p = {k: jnp.asarray(np.asarray(v), dtype) for k, v in p.items()}
    rng = np.random.default_rng(0)
    xs = jnp.asarray(0.1 * rng.standard_normal((B, T + 1, 4)), dtype)
    us = jnp.asarray(0.2 * rng.standard_normal((B, T, 2)), dtype)
    mult = init_multipliers(problem, T, dtype)
    one = jnp.asarray(1.0, dtype)
    hyper = _boxqp_hyper(ddp.SolverOptions())

    def one_lane(xs_, us_, lam_):
        d = calc_derivs(problem, xs_, us_, p, mult.mu_le, mult.mu_li,
                        mult.mu_fe, mult.mu_fi, one, one, full_ddp)
        bp = back_pass(d, us_, lam_, 1, full_ddp, hyper)
        return bp, d.ok

    lams = jnp.asarray([0.0, 0.3, 5.0, 0.01], dtype)
    ref, ref_ok = jax.vmap(one_lane)(xs, us, lams)

    bcast = lambda a: jnp.broadcast_to(a[None], (B,) + a.shape)
    ones = jnp.ones((B,), dtype)
    got, got_ok = fused_derivs_back_pass(
        problem, xs, us, bcast(mult.mu_le), bcast(mult.mu_li),
        bcast(mult.mu_fe), bcast(mult.mu_fi), ones, ones, lams, p,
        1, full_ddp, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref_ok), np.asarray(got_ok))
    np.testing.assert_array_equal(np.asarray(ref.failed),
                                  np.asarray(got.failed))
    # asin-substitution noise only (~1e-6 relative)
    np.testing.assert_allclose(np.asarray(got.l), np.asarray(ref.l),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.L), np.asarray(ref.L),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.dV), np.asarray(ref.dV),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.g_norm), np.asarray(ref.g_norm),
                               atol=1e-6)


def test_fused_solver_end_to_end():
    B, T = 4, 40
    problem = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=T)
    rng = np.random.default_rng(0)
    x0s = np.tile(np.asarray(x0), (B, 1))
    u0s = 0.1 * rng.standard_normal((B, T, 2))
    s1 = ddp.make_batched_solver(
        problem, ddp.SolverOptions(max_iter=30))(x0s, u0s, p)
    s2 = ddp.make_batched_solver(
        problem, ddp.SolverOptions(max_iter=30, backpass_method="fused")
    )(x0s, u0s, p)
    assert np.all(np.asarray(s2.success))
    np.testing.assert_allclose(np.asarray(s2.cost), np.asarray(s1.cost),
                               rtol=1e-9)


def test_fused_with_al_constraints():
    """hfe/hli families flow through the fused kernel's AL-augmented
    derivatives."""
    B, n = 4, 30
    problem = brachistochrone.brachistochrone_hli()
    p, x0, u0 = brachistochrone.default_setup_hli(n)
    p = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float64), p)
    rng = np.random.default_rng(2)
    x0s = np.tile(np.asarray(x0), (B, 1))
    u0s = -np.abs(rng.uniform(0.5, 1.5, (B, n, 1)))
    opts = dict(max_iter=25, w_pen_init_l=40.0, w_pen_init_f=1e-5,
                w_pen_max_f=1.0, full_ddp=False)
    s1 = ddp.make_batched_solver(
        problem, ddp.SolverOptions(**opts))(x0s, u0s, p)
    s2 = ddp.make_batched_solver(
        problem, ddp.SolverOptions(**opts, backpass_method="fused")
    )(x0s, u0s, p)
    np.testing.assert_allclose(np.asarray(s2.cost), np.asarray(s1.cost),
                               rtol=1e-6)


def test_fused_batched_params_falls_back():
    B, T = 3, 20
    problem = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=T)
    rng = np.random.default_rng(1)
    x0s = np.tile(np.asarray(x0), (B, 1))
    u0s = 0.1 * rng.standard_normal((B, T, 2))
    pb = {k: np.tile(np.asarray(v, np.float64), (B,) + (1,) * np.ndim(v))
          for k, v in p.items()}
    s1 = ddp.make_batched_solver(
        problem, ddp.SolverOptions(max_iter=20), batch_params=True
    )(x0s, u0s, pb)
    s2 = ddp.make_batched_solver(
        problem, ddp.SolverOptions(max_iter=20, backpass_method="fused"),
        batch_params=True,
    )(x0s, u0s, pb)
    np.testing.assert_array_equal(np.asarray(s2.cost), np.asarray(s1.cost))
