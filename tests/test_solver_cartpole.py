"""End-to-end cart-pole swing-up (extra model family beyond the reference's
two examples; exercises n_u=1 with active box constraints)."""

import numpy as np
import pytest

import ddp_generator_tpu as ddp
from ddp_generator_tpu.models import cartpole


@pytest.fixture(scope="module")
def pole_solution():
    prob = cartpole.cartpole()
    p, x0, u0 = cartpole.default_setup(T=150, seed=0)
    sol = ddp.solve(prob, x0, u0, p, ddp.SolverOptions(max_iter=150))
    return prob, p, sol


def test_cartpole_swings_up(pole_solution):
    prob, p, sol = pole_solution
    assert bool(sol.success)
    final = np.asarray(sol.xs[-1])
    # upright: cos(th) ~ 1; near the origin with small rates
    assert np.cos(final[1]) > 0.98, final
    assert abs(final[0]) < 0.5, final
    assert abs(final[3]) < 1.0, final


def test_cartpole_respects_force_limits(pole_solution):
    prob, p, sol = pole_solution
    us = np.asarray(sol.us)
    assert np.max(np.abs(us)) <= 15.0 + 1e-12


def test_cartpole_saturates_tight_force_limit(pole_solution):
    # At +-4 N the preferred swing-up (peak ~6 N under the loose +-15 limit)
    # is infeasible, so the optimum must ride the bound: the clamp machinery
    # (limitsU/boxQP, iLQG_func.tem:75-119 semantics) is provably engaged.
    prob, _, _ = pole_solution
    p, x0, u0 = cartpole.default_setup(T=150, seed=0)
    p["limF"] = np.array([-4.0, 4.0])
    sol = ddp.solve(prob, x0, u0, p, ddp.SolverOptions(max_iter=150))
    assert bool(sol.success)
    us = np.asarray(sol.us)
    assert np.max(np.abs(us)) <= 4.0 + 1e-12
    assert np.any(np.abs(us) > 4.0 - 1e-9)
    assert np.cos(np.asarray(sol.xs[-1])[1]) > 0.98


def test_cartpole_pallas_backpass_matches_serial(pole_solution):
    """n_u=1 path through the fused kernel (interpret mode on CPU)."""
    prob = cartpole.cartpole()
    p, x0, u0 = cartpole.default_setup(T=40, seed=1)
    o_serial = ddp.SolverOptions(max_iter=8, backpass_method="serial")
    o_pallas = ddp.SolverOptions(max_iter=8, backpass_method="pallas")
    a = ddp.make_batched_solver(prob, o_serial)(
        np.tile(x0, (2, 1)), np.stack([u0, u0 * 0.5]), p
    )
    b = ddp.make_batched_solver(prob, o_pallas)(
        np.tile(x0, (2, 1)), np.stack([u0, u0 * 0.5]), p
    )
    np.testing.assert_allclose(
        np.asarray(a.cost), np.asarray(b.cost), rtol=1e-10
    )
    np.testing.assert_array_equal(
        np.asarray(a.iterations), np.asarray(b.iterations)
    )
