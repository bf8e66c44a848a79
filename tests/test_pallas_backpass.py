"""Parity tests for the fused Pallas backward-pass kernel.

The kernel (``ops/pallas_backpass.py``) must produce the same gains, dV,
g_norm and failure flags as the reference-faithful reverse-scan
implementation (``ops/backpass.py``) -- on CPU it runs in interpret mode.
Covers: constrained (CarParking-like bounds), unconstrained (infinite
bounds), regType 1/2, FULL_DDP on/off, and an indefinite-Quu failure lane.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ddp_generator_tpu as ddp
from ddp_generator_tpu.derivs import DerivBundle, FinalDerivs, StepDerivs
from ddp_generator_tpu.models import car_parking
from ddp_generator_tpu.ops.backpass import back_pass
from ddp_generator_tpu.ops.boxqp import BoxQPHyper
from ddp_generator_tpu.ops.pallas_backpass import batched_back_pass_pallas

INTERPRET = jax.default_backend() != "tpu"


def _rand_bundle(rng, B, N, n_x, n_u, full_ddp, constrained, spd_scale=3.0):
    dt = np.float64 if jax.config.jax_enable_x64 else np.float32

    def r(*shape, scale=1.0):
        return jnp.asarray(scale * rng.standard_normal((B, N) + shape), dt)

    def spd(*shape):
        a = rng.standard_normal((B, N) + shape)
        m = np.einsum("...ij,...kj->...ik", a, a)
        m += spd_scale * np.eye(shape[-1])
        return jnp.asarray(m, dt)

    if constrained:
        lower = r(n_u, scale=0.5) - 1.0
        upper = lower + 0.3 + jnp.abs(r(n_u))
        lower_hx = r(n_u, n_x, scale=0.3)
        upper_hx = r(n_u, n_x, scale=0.3)
        sign = jnp.sign(r(n_u)) + (r(n_u) == 0)
    else:
        lower = jnp.full((B, N, n_u), -jnp.inf, dt)
        upper = jnp.full((B, N, n_u), jnp.inf, dt)
        lower_hx = jnp.zeros((B, N, n_u, n_x), dt)
        upper_hx = jnp.zeros((B, N, n_u, n_x), dt)
        sign = jnp.ones((B, N, n_u), dt)

    def rsym(d0, d1, d2, scale):
        # second-derivative tensors are symmetric in their last two axes
        # (d2f/dada) -- real problems always satisfy this, and the kernel
        # exploits it (it reads only the upper triangle of Quu/Qxx).
        a = r(d0, d1, d2, scale=scale)
        return 0.5 * (a + jnp.swapaxes(a, -1, -2))

    z = jnp.zeros((B, N, 0), dt)
    step = StepDerivs(
        fx=r(n_x, n_x, scale=0.4) + jnp.eye(n_x, dtype=dt),
        fu=r(n_x, n_u, scale=0.4),
        cx=r(n_x),
        cu=r(n_u),
        cxx=spd(n_x, n_x),
        cuu=spd(n_u, n_u),
        cxu=r(n_x, n_u, scale=0.2),
        fxx=rsym(n_x, n_x, n_x, 0.05) if full_ddp else z.reshape(B, N, 0, 0, 0),
        fuu=rsym(n_x, n_u, n_u, 0.05) if full_ddp else z.reshape(B, N, 0, 0, 0),
        fxu=r(n_x, n_x, n_u, scale=0.05) if full_ddp else z.reshape(B, N, 0, 0, 0),
        lower=lower,
        upper=upper,
        lower_hx=lower_hx,
        upper_hx=upper_hx,
        lower_sign=sign,
        upper_sign=sign,
    )
    final = FinalDerivs(
        cx=jnp.asarray(rng.standard_normal((B, n_x)), dt),
        cxx=jnp.asarray(spd(n_x, n_x)[:, 0], dt),
    )
    ok = jnp.ones((B,), bool)
    us = r(n_u)
    return DerivBundle(step=step, final=final, ok=ok), us


@pytest.mark.parametrize("constrained", [True, False])
@pytest.mark.parametrize("reg_type", [1, 2])
@pytest.mark.parametrize("full_ddp", [True, False])
def test_pallas_matches_scan(constrained, reg_type, full_ddp):
    rng = np.random.default_rng(hash((constrained, reg_type, full_ddp)) % 2**31)
    B, N, n_x, n_u = 4, 7, 4, 2
    derivs, us = _rand_bundle(rng, B, N, n_x, n_u, full_ddp, constrained)
    lam = jnp.asarray(np.abs(rng.standard_normal(B)) * 0.1, us.dtype)

    hyper = BoxQPHyper(method="enumerate")
    ref = jax.vmap(
        lambda d, u, lm: back_pass(d, u, lm, reg_type, full_ddp, hyper)
    )(derivs, us, lam)
    out = batched_back_pass_pallas(
        derivs, us, lam, reg_type, full_ddp, interpret=INTERPRET
    )

    tol = 1e-9 if us.dtype == jnp.float64 else 1e-4
    np.testing.assert_array_equal(np.asarray(out.failed), np.asarray(ref.failed))
    np.testing.assert_allclose(out.l, ref.l, rtol=tol, atol=tol)
    np.testing.assert_allclose(out.L, ref.L, rtol=tol, atol=10 * tol)
    np.testing.assert_allclose(out.dV, ref.dV, rtol=tol, atol=tol)
    np.testing.assert_allclose(out.g_norm, ref.g_norm, rtol=tol, atol=tol)


def test_time_blocked_kernel_matches_unblocked():
    """Grid time-blocking (S steps per grid iteration, amortizing the
    ~4us/grid-step fixed cost on TPU) must be bit-compatible with the
    unblocked kernel, including failure-lane freezing across a block
    boundary."""
    rng = np.random.default_rng(11)
    B, N, n_x, n_u = 4, 8, 4, 2
    derivs, us = _rand_bundle(rng, B, N, n_x, n_u, True, True)
    # lane 2 fails at step 5 (inside the second S=4 block)
    cuu = np.array(derivs.step.cuu)
    cuu[2, 5] = np.array([[-5.0, 0.0], [0.0, -5.0]])
    derivs = derivs._replace(step=derivs.step._replace(cuu=jnp.asarray(cuu)))
    lam = jnp.full((B,), 1e-6, us.dtype)

    ref = batched_back_pass_pallas(
        derivs, us, lam, 1, True, interpret=INTERPRET, time_block=1
    )
    for S in (2, 4, 8):
        out = batched_back_pass_pallas(
            derivs, us, lam, 1, True, interpret=INTERPRET, time_block=S
        )
        np.testing.assert_array_equal(
            np.asarray(out.failed), np.asarray(ref.failed)
        )
        assert bool(out.failed[2])
        # XLA codegen at different unroll widths differs by ~1 ulp on CPU
        # (fma contraction); the math itself is identical.
        tol = dict(rtol=1e-13, atol=1e-14)
        np.testing.assert_allclose(out.l, ref.l, **tol)
        np.testing.assert_allclose(out.L, ref.L, **tol)
        np.testing.assert_allclose(out.dV, ref.dV, **tol)
        np.testing.assert_allclose(out.g_norm, ref.g_norm, **tol)


def test_pallas_failure_lane_matches_scan():
    """An indefinite Quu must fail in both implementations, and surviving
    lanes must be unaffected."""
    rng = np.random.default_rng(7)
    B, N, n_x, n_u = 3, 5, 3, 2
    derivs, us = _rand_bundle(rng, B, N, n_x, n_u, False, False)
    # make lane 1's cuu strongly indefinite at step 2
    cuu = np.array(derivs.step.cuu)
    cuu[1, 2] = np.array([[-5.0, 0.0], [0.0, -5.0]])
    derivs = derivs._replace(step=derivs.step._replace(cuu=jnp.asarray(cuu)))
    lam = jnp.full((B,), 1e-6, us.dtype)

    hyper = BoxQPHyper(method="enumerate")
    ref = jax.vmap(
        lambda d, u, lm: back_pass(d, u, lm, 1, False, hyper)
    )(derivs, us, lam)
    out = batched_back_pass_pallas(derivs, us, lam, 1, False, interpret=INTERPRET)

    assert bool(ref.failed[1]) and bool(out.failed[1])
    np.testing.assert_array_equal(np.asarray(out.failed), np.asarray(ref.failed))
    tol = 1e-9 if us.dtype == jnp.float64 else 1e-4
    for lane in (0, 2):
        np.testing.assert_allclose(out.l[lane], ref.l[lane], rtol=tol, atol=tol)
        np.testing.assert_allclose(out.L[lane], ref.L[lane], rtol=tol, atol=10 * tol)


def test_pallas_solver_end_to_end():
    """Full CarParking solve with backpass_method='pallas' matches the
    serial-scan solver."""
    problem = car_parking.car_parking()
    p, x0, u0 = car_parking.default_setup(T=24, seed=0)
    base = ddp.SolverOptions(max_iter=12)

    B = 3
    rng = np.random.default_rng(0)
    x0s = np.tile(x0, (B, 1))
    u0s = 0.1 * rng.standard_normal((B, 24, 2))

    ref = ddp.make_batched_solver(problem, base)(x0s, u0s, p)
    out = ddp.make_batched_solver(
        problem, base.replace(backpass_method="pallas")
    )(x0s, u0s, p)

    np.testing.assert_array_equal(np.asarray(out.success), np.asarray(ref.success))
    np.testing.assert_allclose(out.cost, ref.cost, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(out.us, ref.us, rtol=1e-6, atol=1e-8)
