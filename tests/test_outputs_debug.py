"""User-output (calcG) and debug-utility tests."""

import jax.numpy as jnp
import numpy as np

import ddp_generator_tpu as ddp
from ddp_generator_tpu.models import car_parking
from ddp_generator_tpu.utils.debug import format_mat, format_vec, print_params
from ddp_generator_tpu.utils.timing import Timer, bench_fn


def car_outputs(x, u, p, k):
    # e.g. rolling distance s and lateral slip proxy (optDefCar.mac:4)
    d, h = p["d"], p["h"]
    v, w = x[3], u[0]
    s = d + h * v * jnp.cos(w) - jnp.sqrt(d * d - (h * v * jnp.sin(w)) ** 2)
    return jnp.stack([s, h * v * jnp.sin(w)])


def test_get_g_size_and_calc_g():
    p = car_parking.default_params()
    assert ddp.get_g_size(car_outputs, 4, 2, p) == 2
    prob = car_parking.car_parking()
    rng = np.random.default_rng(0)
    N = 10
    xs = jnp.asarray(rng.normal(size=(N + 1, 4)))
    us = jnp.asarray(rng.normal(size=(N, 2)) * 0.1)
    g = ddp.calc_g(car_outputs, xs, us, p)
    assert g.shape == (N, 2)
    # spot check one step
    expect = car_outputs(xs[3], us[3], p, 3)
    np.testing.assert_allclose(g[3], expect, rtol=1e-12)


def test_output_fn_on_solution():
    prob = car_parking.car_parking()
    p, x0, u0 = car_parking.default_setup(T=40)
    sol = ddp.solve(prob, x0, u0, p, ddp.SolverOptions(max_iter=10))
    out_fn = ddp.make_output_fn(car_outputs)
    g = out_fn(sol.xs, sol.us, p)
    assert g.shape == (40, 2)
    assert np.all(np.isfinite(np.asarray(g)))


def test_debug_formatters(capsys):
    s = format_vec(np.array([1.0, 2.5]), "v")
    assert "v=" in s and "2.5" in s
    m = format_mat(np.eye(2), "M", tri=True)
    assert "M=" in s or "M=" in m
    p = car_parking.default_params()
    txt = print_params(p, k=0)
    assert "d= 2" in txt
    assert "limW" in txt


def test_timer_and_bench():
    import jax

    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((16,))
    with Timer("t", sync=None) as t:
        f(x)
    assert t.seconds >= 0
    dt, out = bench_fn(f, x, repeats=2)
    assert dt >= 0
    np.testing.assert_allclose(out, 2.0)


def test_backpass_trace_matches_solver_pass():
    """debugging.backpass_trace must reproduce the in-loop backward pass
    exactly (same l/L/dV/g_norm) while exposing every intermediate."""
    import jax.numpy as jnp
    import numpy as np
    import ddp_generator_tpu as ddp
    from ddp_generator_tpu.debugging import backpass_trace, format_backpass_step
    from ddp_generator_tpu.derivs import calc_derivs
    from ddp_generator_tpu.ops.backpass import back_pass
    from ddp_generator_tpu.al import init_multipliers
    from ddp_generator_tpu.models import car_parking
    from ddp_generator_tpu.solver import _boxqp_hyper

    prob = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=40)
    o = ddp.SolverOptions(max_iter=5)
    rng = np.random.default_rng(1)
    u0 = jnp.asarray(0.1 * rng.standard_normal((40, 2)))
    sol = ddp.solve(prob, x0, u0, p, o)
    xs, us = sol.xs, sol.us
    lam = 0.1

    tr = backpass_trace(prob, o, xs, us, lam, p)
    mult = init_multipliers(prob, 40, jnp.float64)
    derivs = calc_derivs(prob, xs, us, p, mult.mu_le, mult.mu_li,
                         mult.mu_fe, mult.mu_fi, jnp.asarray(1.0),
                         jnp.asarray(1.0), o.full_ddp)
    bp = back_pass(derivs, us, jnp.asarray(lam), o.regType, o.full_ddp,
                   _boxqp_hyper(o))
    np.testing.assert_allclose(np.asarray(tr.l), np.asarray(bp.l), atol=1e-14)
    np.testing.assert_allclose(np.asarray(tr.L), np.asarray(bp.L), atol=1e-14)
    np.testing.assert_allclose(np.asarray(tr.dV.sum(0)), np.asarray(bp.dV),
                               atol=1e-12)
    np.testing.assert_allclose(float(tr.g.sum() / (40 - 1)),
                               float(bp.g_norm), rtol=1e-12)
    # the formatted dump mentions the key quantities
    s = format_backpass_step(tr, 3)
    for key in ("Qu", "Quu", "QuuF", "boxQP res", "l=", "L="):
        assert key in s
