"""Brachistochrone example problems.

Re-derivation of ``examples/Brachistochrone/optDefBrachi.mac`` and
``optDefBrachi_hli.mac``: one state ``y`` (height, negative), one input ``dy``
(slope over a horizontal step ``dx``), running cost = travel time of the
segment (the reference computes it as a symbolic integral,
``optDefBrachi.mac:10``; here the closed form of that same integral):

    L = integral_0^dx sqrt((1 + dy^2) / (2 g |y + s*dy|)) ds
      = sqrt((1+dy^2)/(2g)) * 2*(sqrt(-y - dx*dy) - sqrt(-y)) / (-dy)

valid under the reference's assumptions ``y < 0``, ``dy < 0``, ``dx > 0``.

* ``brachistochrone()``: terminal equality ``hfe[1] = y - yf``
  (``optDefBrachi.mac:13``).
* ``brachistochrone_hli()``: adds the time-varying running inequality
  ``hli[1] = ymin[k] - y`` (moving floor) and terminal equality against
  ``ymin[k]`` (``optDefBrachi_hli.mac:13-14``) -- exercising ``[k]``-indexed
  parameters.

The analytic optimum is the cycloid ``x = a(phi - sin phi),
y = a(cos phi - 1)`` (``testBrachi.m:29-35``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..problem import Problem, make_problem


def _segment_time(y, dy, g, dx):
    # Closed form of the reference's symbolic integral (optDefBrachi.mac:10).
    s = jnp.sqrt((1.0 + dy * dy) / (2.0 * g))
    return 2.0 * s * (jnp.sqrt(-y - dx * dy) - jnp.sqrt(-y)) / (-dy)


def brachistochrone() -> Problem:
    def f(x, u, p, k):
        return jnp.array([x[0] + u[0] * p["dx"]])

    def L(x, u, p, k):
        return _segment_time(x[0], u[0], p["g"], p["dx"])

    def F(x, p, k):
        return jnp.zeros(())

    def hfe(x, p, k):
        return x[0] - p["yf"]

    example_params = {"g": 9.81, "yf": -4.0, "dx": 0.1}
    return make_problem(
        n_x=1, n_u=1, f=f, L=L, F=F, hfe=[hfe],
        name="Brachistochrone", example_params=example_params,
    )


def brachistochrone_hli() -> Problem:
    def f(x, u, p, k):
        return jnp.array([x[0] + u[0] * p["dx"]])

    def L(x, u, p, k):
        return _segment_time(x[0], u[0], p["g"], p["dx"])

    def F(x, p, k):
        return jnp.zeros(())

    def hli(x, u, p, k):
        return p["ymin"][k] - x[0]

    def hfe(x, p, k):
        return x[0] - p["ymin"][k]

    example_params = {"g": 9.81, "dx": 0.1, "ymin": np.linspace(-1.0, -4.0, 11)}
    return make_problem(
        n_x=1, n_u=1, f=f, L=L, F=F, hli=[hli], hfe=[hfe],
        name="Brachistochrone_hli", example_params=example_params,
    )


def default_setup(n: int = 500):
    """Workload of ``testBrachi.m:7-24``: p, x0, u0 for horizon n."""
    p = {"g": 9.81, "yf": -4.0, "dx": 2.0 * np.pi / n}
    x0 = np.array([-2.220446049250313e-16])  # x0 = [-eps] (testBrachi.m:10)
    u0 = -np.ones((n, 1))
    return p, x0, u0


def default_setup_hli(n: int = 500):
    """Workload of ``testBrachi_hli.m:7-26``."""
    p = {
        "g": 9.81,
        "dx": 2.0 * np.pi / n,
        "ymin": np.concatenate([np.linspace(-1.0, -5.0, n), [-4.0]]),
    }
    x0 = np.array([-2.220446049250313e-16])
    u0 = -np.ones((n, 1))
    return p, x0, u0


def cycloid(n_points: int = 1000, a: float = 2.0):
    """Analytic optimum overlay (``testBrachi.m:29-35``)."""
    phi = np.linspace(0.0, np.pi, n_points)
    return a * (phi - np.sin(phi)), a * (np.cos(phi) - 1.0)
