"""Derivative-bundle parity vs finite differences.

The reference's derivative oracle is the generated MMex inspection MEX
(modes 0-14, ``iLQG_MMex.tem:81-209``) cross-checked against MATLAB
finite-differencing (SURVEY.md section 4 leg 2).  Here autodiff is checked
against central finite differences directly.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_generator_tpu.al import augmented_L
from ddp_generator_tpu.derivs import calc_derivs
from ddp_generator_tpu.models import brachistochrone, car_parking


def fd_jacobian(fn, x, eps=1e-6):
    """Central differences of a (jitted, numpy-in/numpy-out) callable."""
    x = np.asarray(x, np.float64)
    f0 = np.asarray(fn(x))
    J = np.zeros(f0.shape + x.shape)
    for i in range(x.size):
        dx = np.zeros_like(x)
        dx[i] = eps
        J[..., i] = (np.asarray(fn(x + dx)) - np.asarray(fn(x - dx))) / (2 * eps)
    return J


@pytest.fixture(scope="module")
def car_bundle():
    prob = car_parking.car_parking()
    p = car_parking.default_params()
    rng = np.random.default_rng(42)
    N = 4
    xs = jnp.asarray(rng.normal(size=(N + 1, 4)) * 0.5)
    us = jnp.asarray(rng.normal(size=(N, 2)) * 0.2)
    empty = jnp.zeros((N, 0))

    calc = jax.jit(
        functools.partial(
            calc_derivs,
            prob,
            mu_fe=jnp.zeros(0),
            mu_fi=jnp.zeros(0),
            w_pen_l=jnp.ones(()),
            w_pen_f=jnp.ones(()),
            full_ddp=True,
        )
    )
    d = calc(xs=xs, us=us, p=p, mu_le=empty, mu_li=empty)
    f_j = jax.jit(lambda x, u, k: prob.f(x, u, p, k))
    L_j = jax.jit(lambda x, u, k: prob.L(x, u, p, k))
    return prob, p, xs, us, d, f_j, L_j


def test_fx_fu_vs_fd(car_bundle):
    prob, p, xs, us, d, f_j, L_j = car_bundle
    for k in [0, 3]:
        x, u = np.asarray(xs[k]), np.asarray(us[k])
        fx_fd = fd_jacobian(lambda xv: f_j(jnp.asarray(xv), us[k], k), x)
        fu_fd = fd_jacobian(lambda uv: f_j(xs[k], jnp.asarray(uv), k), u)
        np.testing.assert_allclose(d.step.fx[k], fx_fd, atol=1e-6)
        np.testing.assert_allclose(d.step.fu[k], fu_fd, atol=1e-6)


def test_cost_derivs_vs_fd(car_bundle):
    prob, p, xs, us, d, f_j, L_j = car_bundle
    k = 2
    x, u = np.asarray(xs[k]), np.asarray(us[k])
    gx = jax.jit(jax.grad(L_j, argnums=0))
    cx_fd = fd_jacobian(lambda xv: L_j(jnp.asarray(xv), us[k], k), x)
    cu_fd = fd_jacobian(lambda uv: L_j(xs[k], jnp.asarray(uv), k), u)
    cxx_fd = fd_jacobian(lambda xv: gx(jnp.asarray(xv), us[k], k), x)
    cxu_fd = fd_jacobian(lambda uv: gx(xs[k], jnp.asarray(uv), k), u)
    np.testing.assert_allclose(d.step.cx[k], cx_fd, atol=1e-6)
    np.testing.assert_allclose(d.step.cu[k], cu_fd, atol=1e-6)
    np.testing.assert_allclose(d.step.cxx[k], cxx_fd, atol=1e-6)
    np.testing.assert_allclose(d.step.cxu[k], cxu_fd, atol=1e-6)


def test_second_order_dynamics_vs_fd(car_bundle):
    prob, p, xs, us, d, f_j, L_j = car_bundle
    k = 1
    x, u = np.asarray(xs[k]), np.asarray(us[k])
    jx = jax.jit(jax.jacfwd(f_j, argnums=0))
    ju = jax.jit(jax.jacfwd(f_j, argnums=1))
    fxx_fd = fd_jacobian(lambda xv: jx(jnp.asarray(xv), us[k], k), x)
    fuu_fd = fd_jacobian(lambda uv: ju(xs[k], jnp.asarray(uv), k), u)
    fxu_fd = fd_jacobian(lambda uv: jx(xs[k], jnp.asarray(uv), k), u)
    np.testing.assert_allclose(d.step.fxx[k], fxx_fd, atol=1e-6)
    np.testing.assert_allclose(d.step.fuu[k], fuu_fd, atol=1e-6)
    np.testing.assert_allclose(d.step.fxu[k], fxu_fd, atol=1e-6)


def test_final_derivs_vs_fd(car_bundle):
    prob, p, xs, us, d, f_j, L_j = car_bundle
    N = us.shape[0]
    F_j = jax.jit(lambda x: prob.F(x, p, N))
    gF = jax.jit(jax.grad(F_j))
    x = np.asarray(xs[N])
    np.testing.assert_allclose(
        d.final.cx, fd_jacobian(lambda xv: F_j(jnp.asarray(xv)), x), atol=1e-6
    )
    np.testing.assert_allclose(
        d.final.cxx, fd_jacobian(lambda xv: gF(jnp.asarray(xv)), x), atol=1e-6
    )


def test_al_penalty_derivatives():
    """AL-augmented running cost differentiates through the Ruxton piecewise
    penalty like the reference's diff-through-if rules
    (gen_dep_graph.mac:178-184)."""
    prob = brachistochrone.brachistochrone_hli()
    p, x0, u0 = brachistochrone.default_setup_hli(10)
    k = jnp.asarray(3)
    u = jnp.asarray([-1.0])
    mu_li = jnp.asarray([1.7])
    mu_le = jnp.zeros((0,))
    w = jnp.asarray(40.0)

    La = jax.jit(lambda xv: augmented_L(prob, xv, u, p, k, mu_le, mu_li, w))
    gLa = jax.jit(jax.grad(La))
    for y in (-2.0, -0.5):  # inactive and active hli branches
        x = jnp.asarray([y])
        g = gLa(x)
        g_fd = fd_jacobian(lambda xv: La(jnp.asarray(xv)), np.asarray(x))
        np.testing.assert_allclose(g, g_fd.reshape(g.shape), atol=1e-5, rtol=1e-5)


def test_full_ddp_flag_off():
    prob = car_parking.car_parking()
    p = car_parking.default_params()
    N = 3
    xs = jnp.ones((N + 1, 4)) * 0.3
    us = jnp.ones((N, 2)) * 0.1
    empty = jnp.zeros((N, 0))
    d = jax.jit(
        lambda: calc_derivs(
            prob, xs, us, p, empty, empty, jnp.zeros(0), jnp.zeros(0),
            jnp.ones(()), jnp.ones(()), full_ddp=False,
        )
    )()
    assert d.step.fxx.shape[-1] == 0  # placeholder, FULL_DDP=0 (iLQG.h:4-6)
    assert bool(d.ok)


def test_nan_guard():
    """Non-finite derivatives flip the ok flag (genenerator_main.mac:193-198)."""
    prob = brachistochrone.brachistochrone()
    p, x0, u0 = brachistochrone.default_setup(5)
    N = 5
    xs = jnp.full((N + 1, 1), 1.0)  # y > 0: sqrt(-y) NaN
    us = -jnp.ones((N, 1))
    empty = jnp.zeros((N, 0))
    d = jax.jit(
        lambda: calc_derivs(
            prob, xs, us, p, empty, empty, jnp.zeros(0), jnp.zeros(0),
            jnp.ones(()), jnp.ones(()), full_ddp=False,
        )
    )()
    assert not bool(d.ok)
