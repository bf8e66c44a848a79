"""Numeric parity vs the ACTUAL reference C solver (BASELINE.md target).

Builds the unmodified reference solver core (``/root/reference/iLQG.c``,
``back_pass.c``, ``boxQP.c``, ``cholesky.c``, ``line_search.c``,
``matMult.c``, ``printMat.c``) against a sympy-generated CarParking problem
instantiation (``tests/c_reference/gen_problem_c.py`` standing in for the
Maxima+gentran pipeline), runs the ``testCar.m:14-19`` workload through both
the C binary and this framework in float64, and asserts the BASELINE.md
final-cost parity bound (<= 1e-6).

The two solvers take different fp-rounding paths (their accept/reject
micro-decisions can differ), so iteration counts need not match -- parity is
about converging to the same optimum, which is what the reference user cares
about when switching frameworks.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np
import pytest

import ddp_generator_tpu as ddp
from ddp_generator_tpu.models import car_parking

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(HERE, "c_reference")
REF_DIR = os.environ.get("REF_DIR", "/root/reference")

pytestmark = pytest.mark.skipif(
    shutil.which("gcc") is None or not os.path.isdir(REF_DIR),
    reason="needs gcc and the reference sources",
)


@pytest.fixture(scope="module")
def oracle_bin(tmp_path_factory):
    out_dir = tmp_path_factory.mktemp("c_ref_build")
    subprocess.run(
        [os.path.join(FIXTURE, "build.sh"), str(out_dir)],
        check=True, capture_output=True, env={**os.environ, "REF_DIR": REF_DIR},
    )
    return os.path.join(str(out_dir), "ilqg_car")


def _params():
    # testCar.m:2-11
    return dict(
        cf=np.array([0.1, 0.1, 1.0, 0.3]),
        cu=np.array([1e-2, 1e-4]),
        cx=np.array([1e-3, 1e-3]),
        d=2.0,
        h=0.03,
        limA=np.array([-2.0, 2.0]),
        limW=np.array([-0.5, 0.5]),
        pf=np.array([0.01, 0.01, 0.01, 1.0]),
        px=np.array([0.1, 0.1]),
    )


def _run_oracle(binary, tmp, x0, u0, p, max_iter, tolFun):
    """Marshal the workload into the oracle's binary format and run it."""
    T = u0.shape[0]
    pblk = np.concatenate(
        [np.atleast_1d(np.asarray(p[n], float)).ravel()
         for n in ("cf", "cu", "cx", "d", "h", "limA", "limW", "pf", "px")]
    )
    buf = np.concatenate(
        [[float(T)], np.asarray(x0, float), np.asarray(u0, float).ravel(),
         pblk, [float(max_iter), float(tolFun)]]
    )
    fin = os.path.join(tmp, "in.bin")
    fout = os.path.join(tmp, "out.bin")
    buf.astype("<f8").tofile(fin)
    subprocess.run([binary, fin, fout], check=True, capture_output=True,
                   timeout=600)
    out = np.fromfile(fout, dtype="<f8")
    xs = out[5:5 + (T + 1) * 4].reshape(T + 1, 4)
    us = out[5 + (T + 1) * 4:].reshape(T, 2)
    return dict(success=out[0], cost=out[1], iterations=out[2],
                g_norm=out[3], xs=xs, us=us)


@pytest.mark.parametrize("T,seed", [(500, 0), (100, 1)])
def test_carparking_cost_parity(oracle_bin, tmp_path, T, seed):
    x0 = np.array([1.0, 1.0, np.pi * 1.5, 0.0])
    u0 = 0.1 * np.random.default_rng(seed).standard_normal((T, 2))
    p = _params()

    ref = _run_oracle(oracle_bin, str(tmp_path), x0, u0, p,
                      max_iter=200, tolFun=1e-7)
    assert ref["success"] == 1.0

    problem = car_parking.car_parking()
    opt = ddp.SolverOptions(max_iter=200, dtype="float64", tolFun=1e-7)
    sol = ddp.solve(problem, x0, u0, p, opt)

    assert bool(sol.success)
    # BASELINE.md: final-cost parity vs C mex reference <= 1e-6
    assert abs(float(sol.cost) - ref["cost"]) <= 1e-6

    # The optima agree pointwise too (loose bound: the cost surface is flat
    # near the optimum, so trajectories match to ~sqrt(tol) not tol).
    np.testing.assert_allclose(np.asarray(sol.xs), ref["xs"], atol=5e-3)
    np.testing.assert_allclose(np.asarray(sol.us), ref["us"], atol=5e-3)

    # Cross-evaluation: each solver's trajectory costed by the OTHER side's
    # cost function implementation -- guards against "same number, different
    # objective" false parity.
    from ddp_generator_tpu.ops.forward import cost_only
    import jax.numpy as jnp

    zeros = jnp.zeros((T, 0), jnp.float64)
    zf = jnp.zeros((0,), jnp.float64)
    c_traj_cost = cost_only(
        problem, jnp.asarray(ref["xs"]), jnp.asarray(ref["us"]), p,
        zeros, zeros, zf, zf, jnp.asarray(1.0), jnp.asarray(1.0),
    )
    assert abs(float(c_traj_cost) - ref["cost"]) <= 1e-9
