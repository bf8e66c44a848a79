"""Problem validation and box-constraint analysis tests.

Content mirrors the generator-side validation of the reference
(``genenerator_main.mac:1-27,385-395``; SURVEY.md section 4 leg 4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import ddp_generator_tpu as ddp
from ddp_generator_tpu.models import car_parking
from ddp_generator_tpu.problem import constraint_limit


def test_car_parking_builds_and_analyzes():
    prob = car_parking.car_parking()
    assert prob.n_h == 4
    # h1/h2 constrain w (input 0), h3/h4 constrain a (input 1)
    assert [bc.u_index for bc in prob.box_constraints] == [0, 0, 1, 1]
    assert [bc.sign for bc in prob.box_constraints] == [-1.0, 1.0, -1.0, 1.0]


def test_bad_dynamics_shape_rejected():
    with pytest.raises(ddp.ProblemValidationError):
        ddp.make_problem(
            n_x=2,
            n_u=1,
            f=lambda x, u, p, k: jnp.array([x[0]]),  # wrong size
            L=lambda x, u, p, k: jnp.sum(x**2),
            F=lambda x, p, k: jnp.sum(x**2),
        )


def test_nonscalar_cost_rejected():
    with pytest.raises(ddp.ProblemValidationError):
        ddp.make_problem(
            n_x=1,
            n_u=1,
            f=lambda x, u, p, k: x + u,
            L=lambda x, u, p, k: x**2,  # shape (1,), not scalar
            F=lambda x, p, k: jnp.zeros(()),
        )


def test_multi_input_constraint_rejected():
    # h depending on two inputs (genenerator_main.mac:390-391)
    with pytest.raises(ddp.ProblemValidationError):
        ddp.make_problem(
            n_x=1,
            n_u=2,
            f=lambda x, u, p, k: x + u[:1],
            L=lambda x, u, p, k: jnp.sum(u**2),
            F=lambda x, p, k: jnp.zeros(()),
            h=[lambda x, u, p, k: u[0] + u[1] - 1.0],
        )


def test_non_unit_coefficient_rejected():
    # coefficient must be +-1 (genenerator_main.mac:393-394)
    with pytest.raises(ddp.ProblemValidationError):
        ddp.make_problem(
            n_x=1,
            n_u=1,
            f=lambda x, u, p, k: x + u,
            L=lambda x, u, p, k: jnp.sum(u**2),
            F=lambda x, p, k: jnp.zeros(()),
            h=[lambda x, u, p, k: 2.0 * u[0] - 1.0],
        )


def test_nonlinear_input_constraint_rejected():
    with pytest.raises(ddp.ProblemValidationError):
        ddp.make_problem(
            n_x=1,
            n_u=1,
            f=lambda x, u, p, k: x + u,
            L=lambda x, u, p, k: jnp.sum(u**2),
            F=lambda x, p, k: jnp.zeros(()),
            h=[lambda x, u, p, k: u[0] ** 2 - 1.0],
        )


def test_clamp_u_constant_box():
    prob = car_parking.car_parking()
    p = car_parking.default_params()
    x = jnp.zeros(4)
    k = jnp.asarray(0)
    u = jnp.array([3.0, -5.0])
    uc = ddp.clamp_u(prob, x, u, p, k)
    np.testing.assert_allclose(uc, [0.5, -2.0])  # limW/limA bounds
    u = jnp.array([-3.0, 5.0])
    uc = ddp.clamp_u(prob, x, u, p, k)
    np.testing.assert_allclose(uc, [-0.5, 2.0])


def test_limits_u_relative_bounds_and_hx():
    prob = car_parking.car_parking()
    p = car_parking.default_params()
    x = jnp.zeros(4)
    k = jnp.asarray(0)
    u = jnp.array([0.1, -0.3])
    lo, up, lo_hx, up_hx, lo_s, up_s = ddp.limits_u(prob, x, u, p, k)
    # bounds are relative to u (iLQG_func.tem:91-94)
    np.testing.assert_allclose(lo, [-0.5 - 0.1, -2.0 + 0.3])
    np.testing.assert_allclose(up, [0.5 - 0.1, 2.0 + 0.3])
    # constant box constraints: hx rows are zero, signs +-1
    np.testing.assert_allclose(lo_hx, np.zeros((2, 4)))
    np.testing.assert_allclose(up_hx, np.zeros((2, 4)))
    np.testing.assert_allclose(lo_s, [-1.0, -1.0])
    np.testing.assert_allclose(up_s, [1.0, 1.0])


def test_state_dependent_limit():
    # h = u - x[0] < 0  =>  upper bound u < x[0], hx = d h/dx = [-1]
    prob = ddp.make_problem(
        n_x=1,
        n_u=1,
        f=lambda x, u, p, k: x + u,
        L=lambda x, u, p, k: jnp.sum(u**2),
        F=lambda x, p, k: jnp.zeros(()),
        h=[lambda x, u, p, k: u[0] - x[0]],
    )
    x = jnp.array([0.7])
    u = jnp.array([0.2])
    k = jnp.asarray(0)
    bc = prob.box_constraints[0]
    lim = constraint_limit(bc, x, u, {}, k)
    np.testing.assert_allclose(lim, 0.7)
    lo, up, lo_hx, up_hx, lo_s, up_s = ddp.limits_u(prob, x, u, {}, k)
    np.testing.assert_allclose(up, [0.5])  # 0.7 - 0.2
    assert lo[0] == -np.inf
    np.testing.assert_allclose(up_hx, [[-1.0]])
    np.testing.assert_allclose(up_s, [1.0])
