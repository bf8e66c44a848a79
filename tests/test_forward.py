"""Forward rollout tests (generated forward_pass semantics,
iLQG_func.tem:121-185)."""

import jax.numpy as jnp
import numpy as np

from ddp_generator_tpu.models import car_parking
from ddp_generator_tpu.ops.forward import cost_only, forward_pass


def setup(N=20, seed=0):
    prob = car_parking.car_parking()
    p = car_parking.default_params()
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray([1.0, 1.0, np.pi * 1.5, 0.0])
    us = jnp.asarray(0.1 * rng.standard_normal((N, 2)))
    empty = jnp.zeros((N, 0))
    z0 = jnp.zeros(0)
    one = jnp.ones(())
    return prob, p, x0, us, empty, z0, one


def manual_rollout(prob, p, x0, us):
    xs = [np.asarray(x0)]
    cost = 0.0
    ucl = []
    for k in range(us.shape[0]):
        u = np.clip(np.asarray(us[k]), [-0.5, -2.0], [0.5, 2.0])
        ucl.append(u)
        x = jnp.asarray(xs[-1])
        xs.append(np.asarray(prob.f(x, jnp.asarray(u), p, k)))
        cost += float(prob.L(x, jnp.asarray(u), p, k))
    cost += float(prob.F(jnp.asarray(xs[-1]), p, us.shape[0]))
    return np.stack(xs), np.stack(ucl), cost


def test_open_loop_matches_manual():
    prob, p, x0, us, empty, z0, one = setup()
    N = us.shape[0]
    r = forward_pass(
        prob, x0, jnp.zeros((N + 1, 4)), us,
        jnp.zeros((N, 2)), jnp.zeros((N, 2, 4)),
        jnp.zeros(()), p, empty, empty, z0, z0, one, one,
    )
    xs_m, us_m, cost_m = manual_rollout(prob, p, x0, us)
    assert bool(r.ok)
    np.testing.assert_allclose(r.xs, xs_m, atol=1e-12)
    np.testing.assert_allclose(r.us, us_m, atol=1e-12)  # clamped
    np.testing.assert_allclose(r.cost, cost_m, rtol=1e-12)


def test_closed_loop_feedback_applied():
    prob, p, x0, us, empty, z0, one = setup()
    N = us.shape[0]
    # nominal = the open-loop rollout
    r0 = forward_pass(
        prob, x0, jnp.zeros((N + 1, 4)), us,
        jnp.zeros((N, 2)), jnp.zeros((N, 2, 4)),
        jnp.zeros(()), p, empty, empty, z0, z0, one, one,
    )
    l = jnp.full((N, 2), 0.01)
    L_gain = jnp.zeros((N, 2, 4))
    r1 = forward_pass(
        prob, x0, r0.xs, r0.us, l, L_gain,
        jnp.asarray(0.5), p, empty, empty, z0, z0, one, one,
    )
    # u = u_nom + 0.5*l exactly at k=0 (x=x_nom there)
    np.testing.assert_allclose(r1.us[0], np.asarray(r0.us[0]) + 0.005, atol=1e-12)


def test_alpha_zero_is_exact_open_loop():
    prob, p, x0, us, empty, z0, one = setup()
    N = us.shape[0]
    l = jnp.full((N, 2), 123.0)  # huge gains must be ignored at alpha=0
    L_gain = jnp.full((N, 2, 4), 7.0)
    r = forward_pass(
        prob, x0, jnp.ones((N + 1, 4)), us, l, L_gain,
        jnp.zeros(()), p, empty, empty, z0, z0, one, one,
    )
    r_ref = forward_pass(
        prob, x0, jnp.ones((N + 1, 4)), us,
        jnp.zeros((N, 2)), jnp.zeros((N, 2, 4)),
        jnp.zeros(()), p, empty, empty, z0, z0, one, one,
    )
    np.testing.assert_array_equal(r.us, r_ref.us)
    np.testing.assert_array_equal(r.xs, r_ref.xs)


def test_cost_only_matches_rollout_cost():
    prob, p, x0, us, empty, z0, one = setup()
    N = us.shape[0]
    r = forward_pass(
        prob, x0, jnp.zeros((N + 1, 4)), us,
        jnp.zeros((N, 2)), jnp.zeros((N, 2, 4)),
        jnp.zeros(()), p, empty, empty, z0, z0, one, one,
    )
    c = cost_only(prob, r.xs, r.us, p, empty, empty, z0, z0, one, one)
    np.testing.assert_allclose(c, r.cost, rtol=1e-12)


def test_nan_detection():
    prob, p, x0, us, empty, z0, one = setup()
    N = us.shape[0]
    # tiny axle distance d: h*v*sin(w) quickly exceeds d => sqrt of negative.
    # Drive hard (max steering + acceleration) so v grows.
    bad_p = dict(p, d=1e-4)
    us = jnp.tile(jnp.asarray([[0.4, 2.0]]), (N, 1))
    r = forward_pass(
        prob, x0, jnp.zeros((N + 1, 4)), us,
        jnp.zeros((N, 2)), jnp.zeros((N, 2, 4)),
        jnp.zeros(()), bad_p, empty, empty, z0, z0, one, one,
    )
    assert not bool(r.ok)
