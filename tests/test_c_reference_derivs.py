"""Derivative-level parity vs the reference's analytic formulas.

The reference verifies derivatives through the MMex inspection MEX
(``iLQG_MMex.tem`` modes 0-16, SURVEY.md section 4 leg 2).  Here the same
role is played by ``tests/c_reference/dump_derivs.c``: the unmodified
reference core + generated CarParking code evaluates every derivative object
(fx, fu, fxx, fuu, fxu, Lx..Lxu, Fx, Fxx, box limits) along an arbitrary
trajectory, and this test compares the framework's autodiff bundle against
them elementwise -- analytic (sympy-emitted) vs autodiff (JAX), two
independent derivations of the same math.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_generator_tpu.al import init_multipliers
from ddp_generator_tpu.derivs import calc_derivs
from ddp_generator_tpu.models import car_parking
from ddp_generator_tpu.ops.forward import forward_pass

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(HERE, "c_reference")
REF_DIR = os.environ.get("REF_DIR", "/root/reference")

pytestmark = pytest.mark.skipif(
    shutil.which("gcc") is None or not os.path.isdir(REF_DIR),
    reason="needs gcc and the reference sources",
)

NX, NU = 4, 2
SQXX, SQUU, SQXU = 10, 3, 8


def _unpack_tri(packed, n):
    m = np.zeros((n, n))
    for c in range(n):
        for r in range(c + 1):
            m[r, c] = m[c, r] = packed[c * (c + 1) // 2 + r]
    return m


@pytest.fixture(scope="module")
def dump_bin(tmp_path_factory):
    out_dir = tmp_path_factory.mktemp("c_ref_build")
    subprocess.run(
        [os.path.join(FIXTURE, "build.sh"), str(out_dir)],
        check=True, capture_output=True, env={**os.environ, "REF_DIR": REF_DIR},
    )
    return os.path.join(str(out_dir), "dump_derivs_car")


def test_derivative_parity_vs_reference_formulas(dump_bin, tmp_path):
    T = 7
    rng = np.random.default_rng(42)
    xs = rng.normal(0, 1.0, (T + 1, NX))
    xs[:, 3] *= 0.5  # keep |h*v*sin(w)| < d so sqrt/asin stay in-domain
    us = rng.uniform(-0.4, 0.4, (T, NU))
    p = dict(
        cf=np.array([0.1, 0.1, 1.0, 0.3]), cu=np.array([1e-2, 1e-4]),
        cx=np.array([1e-3, 1e-3]), d=2.0, h=0.03,
        limA=np.array([-2.0, 2.0]), limW=np.array([-0.5, 0.5]),
        pf=np.array([0.01, 0.01, 0.01, 1.0]), px=np.array([0.1, 0.1]),
    )
    pblk = np.concatenate(
        [np.atleast_1d(np.asarray(p[n], float)).ravel()
         for n in ("cf", "cu", "cx", "d", "h", "limA", "limW", "pf", "px")]
    )
    fin = os.path.join(str(tmp_path), "in.bin")
    fout = os.path.join(str(tmp_path), "out.bin")
    np.concatenate([[float(T)], xs.ravel(), us.ravel(), pblk]).astype(
        "<f8").tofile(fin)
    subprocess.run([dump_bin, fin, fout], check=True, capture_output=True,
                   timeout=120)
    out = np.fromfile(fout, dtype="<f8")

    step_len = (NX * NX + NX * NU + NX * SQXX + NX * SQUU + NX * SQXU
                + NX + SQXX + NU + SQUU + SQXU + 4 * NU + 1)
    ref_steps = []
    off = 0
    for k in range(T):
        s = {}
        def grab(n):
            nonlocal off
            v = out[off:off + n]
            off += n
            return v
        s["fx"] = grab(NX * NX).reshape(NX, NX, order="F")
        s["fu"] = grab(NX * NU).reshape(NX, NU, order="F")
        fxx = grab(NX * SQXX)
        s["fxx"] = np.stack([_unpack_tri(fxx[i * SQXX:(i + 1) * SQXX], NX)
                             for i in range(NX)])
        fuu = grab(NX * SQUU)
        s["fuu"] = np.stack([_unpack_tri(fuu[i * SQUU:(i + 1) * SQUU], NU)
                             for i in range(NX)])
        fxu = grab(NX * SQXU)
        s["fxu"] = np.stack([fxu[i * SQXU:(i + 1) * SQXU].reshape(NX, NU,
                                                                  order="F")
                             for i in range(NX)])
        s["cx"] = grab(NX)
        s["cxx"] = _unpack_tri(grab(SQXX), NX)
        s["cu"] = grab(NU)
        s["cuu"] = _unpack_tri(grab(SQUU), NU)
        s["cxu"] = grab(SQXU).reshape(NX, NU, order="F")
        s["lower"] = grab(NU)
        s["upper"] = grab(NU)
        s["lower_sign"] = grab(NU)
        s["upper_sign"] = grab(NU)
        s["c"] = grab(1)[0]
        ref_steps.append(s)
    assert off == T * step_len
    f_cx = out[off:off + NX]; off += NX
    f_cxx = _unpack_tri(out[off:off + SQXX], NX); off += SQXX
    f_c = out[off]; off += 1
    x_roll = out[off:off + (T + 1) * NX].reshape(T + 1, NX); off += (T + 1) * NX
    roll_cost = out[off]

    # --- framework bundle (float64; CarParking has no AL families) ---
    pj = {k: jnp.asarray(np.asarray(v), jnp.float64) for k, v in p.items()}
    mult = init_multipliers(car_parking.car_parking(), T, jnp.float64)
    one = jnp.asarray(1.0, jnp.float64)
    problem = car_parking.car_parking()
    d = calc_derivs(problem, jnp.asarray(xs), jnp.asarray(us), pj,
                    mult.mu_le, mult.mu_li, mult.mu_fe, mult.mu_fi,
                    one, one, True)
    assert bool(d.ok)

    tol = dict(rtol=1e-9, atol=1e-11)
    for k in range(T):
        r = ref_steps[k]
        got = jax.tree_util.tree_map(lambda a: np.asarray(a[k]), d.step)
        np.testing.assert_allclose(got.fx, r["fx"], **tol)
        np.testing.assert_allclose(got.fu, r["fu"], **tol)
        np.testing.assert_allclose(got.fxx, r["fxx"], **tol)
        np.testing.assert_allclose(got.fuu, r["fuu"], **tol)
        np.testing.assert_allclose(got.fxu, r["fxu"], **tol)
        np.testing.assert_allclose(got.cx, r["cx"], **tol)
        np.testing.assert_allclose(got.cxx, r["cxx"], **tol)
        np.testing.assert_allclose(got.cu, r["cu"], **tol)
        np.testing.assert_allclose(got.cuu, r["cuu"], **tol)
        np.testing.assert_allclose(got.cxu, r["cxu"], **tol)
        np.testing.assert_allclose(got.lower, r["lower"], **tol)
        np.testing.assert_allclose(got.upper, r["upper"], **tol)
        np.testing.assert_allclose(got.lower_sign, r["lower_sign"], **tol)
        np.testing.assert_allclose(got.upper_sign, r["upper_sign"], **tol)
    np.testing.assert_allclose(np.asarray(d.final.cx), f_cx, **tol)
    np.testing.assert_allclose(np.asarray(d.final.cxx), f_cxx, **tol)

    # --- rollout / cost parity (ddpf, ddpL, ddpF, clampU through
    #     forward_pass, alpha=0 open loop) ---
    N = T
    zl = jnp.zeros((N, NU), jnp.float64)
    zL = jnp.zeros((N, NU, NX), jnp.float64)
    r0 = forward_pass(problem, jnp.asarray(xs[0]),
                      jnp.zeros((N + 1, NX), jnp.float64), jnp.asarray(us),
                      zl, zL, jnp.zeros((), jnp.float64), pj,
                      mult.mu_le, mult.mu_li, mult.mu_fe, mult.mu_fi,
                      one, one)
    np.testing.assert_allclose(np.asarray(r0.xs), x_roll, rtol=1e-12,
                               atol=1e-12)
    np.testing.assert_allclose(float(r0.cost), roll_cost, rtol=1e-12)
