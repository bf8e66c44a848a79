"""Augmented-Lagrangian penalty and multiplier-update unit tests.

Formula parity with ``genenerator_main.mac:46-124`` (penalties) and
``iLQG_func.tem:417-509`` (updates).
"""

import jax.numpy as jnp
import numpy as np

import ddp_generator_tpu as ddp
from ddp_generator_tpu.al import (
    augmented_F,
    augmented_L,
    init_multipliers,
    update_multipliers,
)
from ddp_generator_tpu.models import brachistochrone


def make_prob():
    # 1 state, 1 input, all four constraint families present
    def f(x, u, p, k):
        return x + u

    def L(x, u, p, k):
        return jnp.sum(u**2)

    def F(x, p, k):
        return jnp.sum(x**2)

    return ddp.make_problem(
        n_x=1, n_u=1, f=f, L=L, F=F,
        hle=[lambda x, u, p, k: x[0] - 1.0],
        hli=[lambda x, u, p, k: x[0] - 2.0],
        hfe=[lambda x, p, k: x[0] - 3.0],
        hfi=[lambda x, p, k: x[0] - 4.0],
    )


def test_init_values():
    # mu_e = 0, mu_i = 1 (iLQG_func.tem:371-400)
    prob = make_prob()
    m = init_multipliers(prob, 5, jnp.float64)
    assert np.all(np.asarray(m.mu_le) == 0.0)
    assert np.all(np.asarray(m.mu_li) == 1.0)
    assert np.all(np.asarray(m.mu_fe) == 0.0)
    assert np.all(np.asarray(m.mu_fi) == 1.0)


def test_equality_penalty_value():
    # p = mu*h + 0.5*w*h^2 (genenerator_main.mac:54)
    prob = make_prob()
    x = jnp.asarray([1.5])  # hle = 0.5
    u = jnp.asarray([0.2])
    mu = jnp.asarray([2.0])
    mu_i = jnp.asarray([0.0])  # kill the inequality term via mu=0
    w = jnp.asarray(3.0)
    c = augmented_L(prob, x, u, {}, 0, mu, mu_i, w)
    expect = 0.2**2 + (2.0 * 0.5 + 0.5 * 3.0 * 0.25)
    np.testing.assert_allclose(c, expect, rtol=1e-12)


def test_inequality_penalty_branches():
    # active: mu*h*(1+w*h); inactive: mu*h/(1-w*h)
    # (genenerator_main.mac:75,112)
    prob = make_prob()
    u = jnp.asarray([0.0])
    mu_e = jnp.asarray([0.0])
    w = jnp.asarray(3.0)
    # active: x=2.5 => hli = 0.5 >= 0
    c = augmented_L(prob, jnp.asarray([2.5]), u, {}, 0, mu_e, jnp.asarray([2.0]), w)
    # note hle=1.5 contributes 0.5*w*h^2 even with mu=0
    expect = 0.5 * 3.0 * 1.5**2 + 2.0 * 0.5 * (1 + 3.0 * 0.5)
    np.testing.assert_allclose(c, expect, rtol=1e-12)
    # inactive: x=1.0 => hli = -1.0
    c = augmented_L(prob, jnp.asarray([1.0]), u, {}, 0, mu_e, jnp.asarray([2.0]), w)
    expect = 0.0 + 2.0 * (-1.0) / (1 - 3.0 * (-1.0))
    np.testing.assert_allclose(c, expect, rtol=1e-12)


def test_final_penalties():
    prob = make_prob()
    w = jnp.asarray(2.0)
    x = jnp.asarray([5.0])  # hfe = 2, hfi = 1
    c = augmented_F(
        prob, x, {}, 0, jnp.asarray([1.0]), jnp.asarray([3.0]), w
    )
    expect = 25.0 + (1.0 * 2.0 + 0.5 * 2.0 * 4.0) + 3.0 * 1.0 * (1 + 2.0 * 1.0)
    np.testing.assert_allclose(c, expect, rtol=1e-12)


def test_multiplier_update_rules():
    prob = make_prob()
    N = 3
    m = init_multipliers(prob, N, jnp.float64)
    xs = jnp.asarray([[1.5], [2.5], [0.5], [5.0]])  # last row = final state
    us = jnp.zeros((N, 1))
    w_l = jnp.asarray(2.0)
    w_f = jnp.asarray(3.0)
    inf = jnp.asarray(np.inf)

    # init pass records last_h only
    up0 = update_multipliers(
        prob, xs, us, {}, m, w_l, w_f, inf, inf, 4.0, 1e-7, init=True
    )
    np.testing.assert_allclose(np.asarray(up0.multipliers.mu_le), 0.0)
    np.testing.assert_allclose(
        np.asarray(up0.multipliers.last_hle)[:, 0], [0.5, 1.5, -0.5]
    )
    np.testing.assert_allclose(float(up0.w_pen_l), 2.0)

    # real update: mu_le+ = mu + w*h; Ruxton branches for mu_li
    up1 = update_multipliers(
        prob, xs, us, {}, up0.multipliers, w_l, w_f, inf, inf, 4.0, 1e-7,
        init=False,
    )
    np.testing.assert_allclose(
        np.asarray(up1.multipliers.mu_le)[:, 0], [2 * 0.5, 2 * 1.5, 2 * -0.5]
    )
    # hli at steps: [-0.5, 0.5, -1.5]; mu_li was 1
    np.testing.assert_allclose(
        np.asarray(up1.multipliers.mu_li)[:, 0],
        [
            (1 - 2.0 * (-0.5)) ** -2,  # inactive
            1 + 2 * 2.0 * 0.5,  # active
            (1 - 2.0 * (-1.5)) ** -2,  # inactive
        ],
    )
    # mu_fe+ = 0 + 3*2 = 6; hfi=1 active: mu_fi+ = 1*(1+2*3*1)=7
    np.testing.assert_allclose(float(up1.multipliers.mu_fe[0]), 6.0)
    np.testing.assert_allclose(float(up1.multipliers.mu_fi[0]), 7.0)


def test_penalty_increase_rule():
    """w_pen *= fact1 when violation didn't shrink enough vs last_h
    (iLQG_func.tem:428-440)."""
    prob = make_prob()
    N = 2
    m = init_multipliers(prob, N, jnp.float64)
    xs = jnp.asarray([[1.5], [1.5], [3.0]])
    us = jnp.zeros((N, 1))
    inf = jnp.asarray(np.inf)
    up0 = update_multipliers(
        prob, xs, us, {}, m, jnp.asarray(1.0), jnp.asarray(1.0), inf, inf,
        4.0, 1e-7, init=True,
    )
    # same violations again: 4*|h| > |last_h| holds => increase
    up1 = update_multipliers(
        prob, xs, us, {}, up0.multipliers, jnp.asarray(1.0), jnp.asarray(1.0),
        inf, inf, 4.0, 1e-7, init=False,
    )
    np.testing.assert_allclose(float(up1.w_pen_l), 4.0)
    # final: hfe = 0 and hfi = -1 (inactive) => no final increase
    np.testing.assert_allclose(float(up1.w_pen_f), 1.0)
    # cap respected
    up2 = update_multipliers(
        prob, xs, us, {}, up0.multipliers, jnp.asarray(1.0), jnp.asarray(1.0),
        jnp.asarray(2.5), inf, 4.0, 1e-7, init=False,
    )
    np.testing.assert_allclose(float(up2.w_pen_l), 2.5)
