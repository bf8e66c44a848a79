"""End-to-end Brachistochrone solves vs the analytic cycloid.

The reference's only ground-truth comparison (``testBrachi.m:29-35``,
SURVEY.md section 4 leg 1): the optimum of the discretized problem is the
cycloid ``x = a(phi - sin phi), y = a(cos phi - 1)`` with a=2 ending at
``y(2*pi) = -4``.
"""

import numpy as np
import pytest

import ddp_generator_tpu as ddp
from ddp_generator_tpu.models import brachistochrone


def cycloid_y(x_query, a=2.0):
    phis = np.linspace(0.0, np.pi, 20001)
    xs = a * (phis - np.sin(phis))
    ys = a * (np.cos(phis) - 1.0)
    return np.interp(x_query, xs, ys)


OPTS = ddp.SolverOptions(
    max_iter=50, w_pen_init_f=40.0, w_pen_fact2=2.0, full_ddp=False
)


@pytest.mark.parametrize("n", [5, 100])
def test_brachistochrone_converges_to_cycloid(n):
    prob = brachistochrone.brachistochrone()
    p, x0, u0 = brachistochrone.default_setup(n)
    sol = ddp.solve(prob, x0, u0, p, OPTS)
    assert bool(sol.success)
    # terminal equality hfe: y(N) = yf = -4 (optDefBrachi.mac:13)
    np.testing.assert_allclose(sol.xs[-1, 0], -4.0, atol=1e-5)
    if n >= 100:
        xgrid = np.linspace(0, 2 * np.pi, n + 1)
        y = np.asarray(sol.xs[:, 0])
        err = np.abs(y - cycloid_y(xgrid))
        # The start of the cycloid has infinite slope, so the discrete
        # optimum deviates most there; that's discretization, not solver
        # error.  Tight agreement away from the start.
        assert np.max(err) < 0.05
        assert np.max(err[n // 2 :]) < 5e-3


def test_brachistochrone_cost_is_cycloid_time():
    # Optimal descent time for a cycloid of parameter a: T = phi_end*sqrt(a/g)
    n = 200
    prob = brachistochrone.brachistochrone()
    p, x0, u0 = brachistochrone.default_setup(n)
    sol = ddp.solve(prob, x0, u0, p, OPTS)
    t_true = np.pi * np.sqrt(2.0 / 9.81)
    # cost includes a small AL penalty residual; compare loosely
    assert abs(float(sol.cost) - t_true) < 0.01


def test_brachistochrone_hli_moving_floor():
    """Time-varying [k]-indexed inequality constraint (optDefBrachi_hli.mac,
    testBrachi_hli.m)."""
    n = 100
    prob = brachistochrone.brachistochrone_hli()
    p, x0, u0 = brachistochrone.default_setup_hli(n)
    opts = ddp.SolverOptions(
        max_iter=40,
        w_pen_init_l=40.0,
        w_pen_init_f=1e-5,
        w_pen_max_f=1.0,
        w_pen_fact2=1.0,
        full_ddp=False,
    )
    sol = ddp.solve(prob, x0, u0, p, opts)
    y = np.asarray(sol.xs[:, 0])
    ymin = np.asarray(p["ymin"])
    # floor respected (hli: ymin[k] - y < 0) up to AL tolerance
    assert np.max(ymin[:n] - y[:n]) < 5e-2
    # terminal equality y(N) = ymin[N] = -4
    np.testing.assert_allclose(y[-1], -4.0, atol=1e-3)


def test_status_and_logs():
    n = 50
    prob = brachistochrone.brachistochrone()
    p, x0, u0 = brachistochrone.default_setup(n)
    sol = ddp.solve(prob, x0, u0, p, OPTS)
    it = int(sol.iterations)
    assert sol.status in (
        ddp.STATUS_SUCCESS_GRADIENT,
        ddp.STATUS_SUCCESS_TOLFUN,
    )
    # line-search logs populated for executed iterations (line_search.c:70-72)
    assert np.all(np.asarray(sol.log_linesearch[: it + 1]) >= 1)
    assert np.all(np.asarray(sol.log_cost[: it + 1]) != 0.0)
