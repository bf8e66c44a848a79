"""Parallel associative-scan Riccati vs the serial backward pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_generator_tpu.derivs import calc_derivs
from ddp_generator_tpu.models import brachistochrone
from ddp_generator_tpu.ops.backpass import back_pass
from ddp_generator_tpu.ops.forward import forward_pass
from ddp_generator_tpu.ops.parallel_riccati import parallel_back_pass


def make_lq_problem(n_x=3, n_u=2, N=40, seed=0):
    """Random time-invariant LQ problem via a synthetic Problem-like bundle."""
    import ddp_generator_tpu as ddp

    rng = np.random.default_rng(seed)
    Ad = np.eye(n_x) + 0.05 * rng.standard_normal((n_x, n_x))
    Bd = 0.1 * rng.standard_normal((n_x, n_u))
    Q = np.eye(n_x) * 0.5
    R = np.eye(n_u) * 0.2
    S = 0.05 * rng.standard_normal((n_x, n_u))

    prob = ddp.make_problem(
        n_x=n_x, n_u=n_u,
        f=lambda x, u, p, k: jnp.asarray(Ad) @ x + jnp.asarray(Bd) @ u,
        L=lambda x, u, p, k: 0.5 * x @ jnp.asarray(Q) @ x
        + 0.5 * u @ jnp.asarray(R) @ u + x @ jnp.asarray(S) @ u
        + 0.01 * jnp.sum(x) + 0.02 * jnp.sum(u),
        F=lambda x, p, k: jnp.sum(x**2),
        name="lq",
    )
    x0 = rng.standard_normal(n_x)
    us = 0.1 * rng.standard_normal((N, n_u))
    return prob, x0, us


def bundle_for(prob, x0, us):
    N = us.shape[0]
    empty = jnp.zeros((N, 0))
    z0 = jnp.zeros(0)
    one = jnp.ones(())
    r = forward_pass(
        prob, jnp.asarray(x0), jnp.zeros((N + 1, prob.n_x)), jnp.asarray(us),
        jnp.zeros((N, prob.n_u)), jnp.zeros((N, prob.n_u, prob.n_x)),
        jnp.zeros(()), {}, empty, empty, z0, z0, one, one,
    )
    return r, calc_derivs(
        prob, r.xs, r.us, {}, empty, empty, z0, z0, one, one, False
    )


@pytest.mark.parametrize("lam", [0.0, 0.3])
def test_matches_serial_lq(lam):
    prob, x0, us = make_lq_problem()
    r, d = bundle_for(prob, x0, us)
    lamj = jnp.asarray(lam)
    ser = back_pass(d, r.us, lamj, 1, False)
    par = parallel_back_pass(d, r.us, lamj, 1)
    assert not bool(ser.failed) and not bool(par.failed)
    if lam == 0.0:
        # identical recursions at lambda=0
        np.testing.assert_allclose(par.l, ser.l, rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(par.L, ser.L, rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(par.dV, ser.dV, rtol=1e-9)
        np.testing.assert_allclose(par.g_norm, ser.g_norm, rtol=1e-9)
    else:
        # lambda>0: the parallel pass folds regularization into the stage
        # cost (module docstring); directions agree to regularization level
        np.testing.assert_allclose(par.l, ser.l, rtol=0.5, atol=0.05)
        # both must be descent directions
        assert float(par.dV[0]) < 0 and float(ser.dV[0]) < 0


def test_matches_serial_brachistochrone():
    prob = brachistochrone.brachistochrone()
    p, x0, u0 = brachistochrone.default_setup(200)
    N = 200
    empty = jnp.zeros((N, 0))
    z0 = jnp.zeros(0)
    w = jnp.asarray(40.0)
    r = forward_pass(
        prob, jnp.asarray(x0), jnp.zeros((N + 1, 1)), jnp.asarray(u0),
        jnp.zeros((N, 1)), jnp.zeros((N, 1, 1)), jnp.zeros(()), p,
        empty, empty, jnp.zeros(1), z0, jnp.ones(()), w,
    )
    d = calc_derivs(prob, r.xs, r.us, p, empty, empty, jnp.zeros(1),
                    jnp.zeros(0), jnp.ones(()), w, False)
    ser = back_pass(d, r.us, jnp.zeros(()), 1, False)
    par = parallel_back_pass(d, r.us, jnp.zeros(()), 1)
    np.testing.assert_allclose(par.l, ser.l, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(par.L, ser.L, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(par.g_norm, ser.g_norm, rtol=1e-8)


def test_full_solver_with_parallel_backpass():
    import ddp_generator_tpu as ddp

    prob = brachistochrone.brachistochrone()
    p, x0, u0 = brachistochrone.default_setup(100)
    base = ddp.SolverOptions(
        max_iter=50, w_pen_init_f=40.0, w_pen_fact2=2.0, full_ddp=False
    )
    sol_s = ddp.solve(prob, x0, u0, p, base)
    sol_p = ddp.solve(prob, x0, u0, p, base.replace(backpass_method="parallel"))
    assert bool(sol_p.success)
    np.testing.assert_allclose(sol_p.xs[-1, 0], -4.0, atol=1e-5)
    # same optimum as the serial path
    np.testing.assert_allclose(sol_p.cost, sol_s.cost, rtol=1e-6)


def test_parallel_rejected_for_constrained_problems():
    import ddp_generator_tpu as ddp
    from ddp_generator_tpu.models import car_parking

    prob = car_parking.car_parking()
    with pytest.raises(ValueError, match="parallel"):
        ddp.make_solver(
            prob, ddp.SolverOptions(backpass_method="parallel", full_ddp=False)
        )
