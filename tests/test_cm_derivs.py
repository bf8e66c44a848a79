"""Packed component-major derivative emission (ops/cm_derivs.py).

Checks (float64, CPU):
1. `batched_calc_derivs_cm` values match `calc_derivs` exactly-ish
   (same math via jax.linearize vs jacfwd) after packing/transposition.
2. `cm_derivs_back_pass` (XLA CM derivs + interpret-mode Pallas kernel)
   matches vmapped calc_derivs + scan back_pass.
3. The batched solver on the combined path matches the serial solver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ddp_generator_tpu as ddp
from ddp_generator_tpu.derivs import calc_derivs
from ddp_generator_tpu.models import car_parking
from ddp_generator_tpu.ops.backpass import back_pass
from ddp_generator_tpu.ops.cm_derivs import (
    batched_calc_derivs_cm,
    cm_derivs_back_pass,
)
from ddp_generator_tpu.ops.pallas_backpass import tri_index
from ddp_generator_tpu.solver import _boxqp_hyper


def _setup(B=3, T=24, full_ddp=True):
    problem = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=T, seed=0)
    rng = np.random.default_rng(1)
    x0s = np.tile(np.asarray(x0), (B, 1)) + 0.01 * rng.standard_normal((B, 4))
    u0s = 0.1 * rng.standard_normal((B, T, 2))
    # Roll the nominal trajectory forward so derivatives are evaluated at a
    # generic point.
    def roll(x0_, us_):
        def step(x, u):
            xn = jnp.asarray(problem.f(x, u, p, 0))
            return xn, x
        xN, xs = jax.lax.scan(step, jnp.asarray(x0_), jnp.asarray(us_))
        return jnp.concatenate([xs, xN[None]], axis=0)

    xs = jax.vmap(roll)(jnp.asarray(x0s), jnp.asarray(u0s))
    us = jnp.asarray(u0s)
    z = lambda *s: jnp.zeros(s)
    mu_le, mu_li = z(B, T, 0), z(B, T, 0)
    mu_fe, mu_fi = z(B, 0), z(B, 0)
    wl = jnp.ones((B,))
    wf = jnp.ones((B,))
    return problem, p, xs, us, mu_le, mu_li, mu_fe, mu_fi, wl, wf


@pytest.mark.parametrize("full_ddp", [True, False])
def test_cm_bundle_matches_calc_derivs(full_ddp):
    (problem, p, xs, us, mu_le, mu_li, mu_fe, mu_fi, wl, wf) = _setup()
    B, T = us.shape[0], us.shape[1]
    n_x, n_u = problem.n_x, problem.n_u

    sd_cm, fcx, fcxx, ok = jax.jit(
        lambda *a: batched_calc_derivs_cm(problem, *a, full_ddp=full_ddp)
    )(xs, us, p, mu_le, mu_li, mu_fe, mu_fi, wl, wf)

    d = jax.vmap(
        lambda xs_, us_, mle, mli, mfe, mfi, wl_, wf_: calc_derivs(
            problem, xs_, us_, p, mle, mli, mfe, mfi, wl_, wf_, full_ddp
        )
    )(xs, us, mu_le, mu_li, mu_fe, mu_fi, wl, wf)

    tol = dict(rtol=1e-9, atol=1e-11)

    def cm_of(a):  # (B, T, d...) -> component-outer (C, T, B)
        return np.transpose(np.asarray(a).reshape(B, T, -1), (2, 1, 0))

    np.testing.assert_allclose(np.asarray(sd_cm["fx"]), cm_of(d.step.fx), **tol)
    np.testing.assert_allclose(np.asarray(sd_cm["fu"]), cm_of(d.step.fu), **tol)
    np.testing.assert_allclose(np.asarray(sd_cm["cx"]), cm_of(d.step.cx), **tol)
    np.testing.assert_allclose(np.asarray(sd_cm["cu"]), cm_of(d.step.cu), **tol)
    np.testing.assert_allclose(
        np.asarray(sd_cm["cxu"]), cm_of(d.step.cxu), **tol
    )

    # packed symmetric components (component axis is OUTER)
    cxx = np.asarray(d.step.cxx)
    for a in range(n_x):
        for b in range(a, n_x):
            np.testing.assert_allclose(
                np.asarray(sd_cm["cxx"])[tri_index(a, b, n_x), :, :],
                np.transpose(cxx[:, :, a, b], (1, 0)),
                **tol,
            )
    cuu = np.asarray(d.step.cuu)
    for a in range(n_u):
        for b in range(a, n_u):
            np.testing.assert_allclose(
                np.asarray(sd_cm["cuu"])[tri_index(a, b, n_u), :, :],
                np.transpose(cuu[:, :, a, b], (1, 0)),
                **tol,
            )
    if full_ddp:
        fxx = np.asarray(d.step.fxx)
        TXS = n_x * (n_x + 1) // 2
        for i in range(n_x):
            for a in range(n_x):
                for b in range(a, n_x):
                    np.testing.assert_allclose(
                        np.asarray(sd_cm["fxx"])[
                            i * TXS + tri_index(a, b, n_x), :, :
                        ],
                        np.transpose(fxx[:, :, i, a, b], (1, 0)),
                        **tol,
                    )

    # box limits (include +-inf rows: exact equality there)
    np.testing.assert_allclose(
        np.asarray(sd_cm["lower"]), cm_of(d.step.lower), **tol
    )
    np.testing.assert_allclose(
        np.asarray(sd_cm["upper"]), cm_of(d.step.upper), **tol
    )
    np.testing.assert_allclose(
        np.asarray(sd_cm["lower_hx"]), cm_of(d.step.lower_hx), **tol
    )
    np.testing.assert_allclose(
        np.asarray(sd_cm["upper_sign"]), cm_of(d.step.upper_sign), **tol
    )

    np.testing.assert_allclose(np.asarray(fcx), np.asarray(d.final.cx).T, **tol)
    np.testing.assert_allclose(
        np.asarray(fcxx), np.asarray(d.final.cxx).reshape(B, -1).T, **tol
    )
    assert np.asarray(ok).all() == np.asarray(d.ok).all()


def test_cm_back_pass_matches_scan():
    (problem, p, xs, us, mu_le, mu_li, mu_fe, mu_fi, wl, wf) = _setup()
    B = us.shape[0]
    o = ddp.SolverOptions(dtype="float64")
    hyper = _boxqp_hyper(o)
    lam = jnp.asarray([1.0, 0.01, 100.0])

    bp_cm, ok = jax.jit(
        lambda *a: cm_derivs_back_pass(
            problem, *a, reg_type=o.regType, full_ddp=True, interpret=True
        )
    )(xs, us, mu_le, mu_li, mu_fe, mu_fi, wl, wf, lam, p)

    d = jax.vmap(
        lambda xs_, us_, mle, mli, mfe, mfi, wl_, wf_: calc_derivs(
            problem, xs_, us_, p, mle, mli, mfe, mfi, wl_, wf_, True
        )
    )(xs, us, mu_le, mu_li, mu_fe, mu_fi, wl, wf)
    bp_ref = jax.vmap(
        lambda d_, us_, lam_: back_pass(d_, us_, lam_, o.regType, True, hyper)
    )(d, us, lam)

    np.testing.assert_allclose(
        np.asarray(bp_cm.l), np.asarray(bp_ref.l), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(bp_cm.L), np.asarray(bp_ref.L), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(bp_cm.dV), np.asarray(bp_ref.dV), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(bp_cm.g_norm), np.asarray(bp_ref.g_norm), rtol=1e-7,
        atol=1e-12,
    )
    assert (np.asarray(bp_cm.failed) == np.asarray(bp_ref.failed)).all()
    assert np.asarray(ok).all()


def test_emit_once_kernel_twice_matches_two_full_calls():
    """The cm_emit / cm_back_pass_from_bundle split exists so a lambda
    retry re-runs ONLY the kernel on the frozen bundle (iLQG.c:261-284);
    two kernel calls at different lambdas on one emitted bundle must equal
    two full emit+kernel passes."""
    from ddp_generator_tpu.ops.cm_derivs import (
        cm_back_pass_from_bundle,
        cm_derivs_back_pass,
        cm_emit,
    )

    (problem, p, xs, us, mu_le, mu_li, mu_fe, mu_fi, wl, wf) = _setup()
    B = us.shape[0]
    lam1 = jnp.full((B,), 0.1)
    lam2 = jnp.full((B,), 1.6)  # an escalated-retry lambda

    # NB: unjitted -- `pad` is a static python int consumed by slicing.
    sd_cm, fcx, fcxx, us_cm, ok, pad = cm_emit(
        problem, xs, us, mu_le, mu_li, mu_fe, mu_fi, wl, wf,
        params=p, full_ddp=True)
    from_bundle = jax.jit(
        lambda lm: cm_back_pass_from_bundle(
            dict(sd_cm), fcx, fcxx, us_cm, lm, problem.n_x, 1, True, pad,
            interpret=True)
    )
    full = jax.jit(
        lambda lm: cm_derivs_back_pass(
            problem, xs, us, mu_le, mu_li, mu_fe, mu_fi, wl, wf, lm, p,
            1, True, interpret=True)[0]
    )
    # Separate jit programs fuse the emission differently -> ~1 ulp noise.
    tol = dict(rtol=1e-13, atol=1e-15)
    for lam in (lam1, lam2):
        a, b = from_bundle(lam), full(lam)
        np.testing.assert_array_equal(np.asarray(a.failed),
                                      np.asarray(b.failed))
        np.testing.assert_allclose(np.asarray(a.l), np.asarray(b.l), **tol)
        np.testing.assert_allclose(np.asarray(a.L), np.asarray(b.L), **tol)
        np.testing.assert_allclose(np.asarray(a.g_norm),
                                   np.asarray(b.g_norm), **tol)


def test_batched_solver_combined_path_matches_serial():
    problem = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=40, seed=0)
    rng = np.random.default_rng(0)
    B = 4
    x0s = np.tile(np.asarray(x0), (B, 1))
    u0s = 0.1 * rng.standard_normal((B, 40, 2))
    o_s = ddp.SolverOptions(max_iter=30, tolFun=1e-7)
    o_p = o_s.replace(backpass_method="pallas")
    s1 = ddp.make_batched_solver(problem, o_s)(x0s, u0s, p)
    s2 = ddp.make_batched_solver(problem, o_p)(x0s, u0s, p)
    np.testing.assert_allclose(
        np.asarray(s1.cost), np.asarray(s2.cost), rtol=1e-9, atol=1e-11
    )
    assert (np.asarray(s1.iterations) == np.asarray(s2.iterations)).all()
    assert (np.asarray(s1.status) == np.asarray(s2.status)).all()
