"""End-to-end CarParking solve (the reference's headline workload,
``testCar.m``: T=500, max_iter=200, input box constraints active)."""

import numpy as np
import pytest

import ddp_generator_tpu as ddp
from ddp_generator_tpu.models import car_parking


@pytest.fixture(scope="module")
def car_solution():
    prob = car_parking.car_parking()
    p, x0, u0 = car_parking.default_setup(T=500, seed=0)
    sol = ddp.solve(prob, x0, u0, p, ddp.SolverOptions(max_iter=200))
    return prob, p, sol


def test_car_converges(car_solution):
    prob, p, sol = car_solution
    assert bool(sol.success)
    assert sol.status in (ddp.STATUS_SUCCESS_GRADIENT, ddp.STATUS_SUCCESS_TOLFUN)
    # parks near the origin (testCar goal state)
    final = np.asarray(sol.xs[-1])
    assert np.all(np.abs(final) < 0.1), final


def test_car_respects_input_bounds(car_solution):
    prob, p, sol = car_solution
    us = np.asarray(sol.us)
    # clampU guarantees hard feasibility (iLQG_func.tem:68-73)
    assert np.max(us[:, 0]) <= 0.5 + 1e-12
    assert np.min(us[:, 0]) >= -0.5 - 1e-12
    assert np.max(us[:, 1]) <= 2.0 + 1e-12
    assert np.min(us[:, 1]) >= -2.0 - 1e-12
    # constraints actually activate in this workload
    assert np.any(np.abs(us[:, 0]) > 0.5 - 1e-9)


def test_car_cost_decreased(car_solution):
    prob, p, sol = car_solution
    it = int(sol.iterations)
    costs = np.asarray(sol.log_cost[:it])
    assert float(sol.cost) < 2.5  # converged cost level for this workload
    # accepted costs are monotonically non-increasing over iterations
    acc = costs[costs != 0.0]
    assert acc[-1] <= acc[0]


def test_car_full_ddp_off_also_converges():
    prob = car_parking.car_parking()
    p, x0, u0 = car_parking.default_setup(T=200, seed=1)
    sol = ddp.solve(
        prob, x0, u0, p, ddp.SolverOptions(max_iter=150, full_ddp=False)
    )
    assert bool(sol.success)


def test_car_regtype2():
    prob = car_parking.car_parking()
    p, x0, u0 = car_parking.default_setup(T=200, seed=2)
    sol = ddp.solve(
        prob, x0, u0, p, ddp.SolverOptions(max_iter=150, regType=2)
    )
    assert bool(sol.success)
