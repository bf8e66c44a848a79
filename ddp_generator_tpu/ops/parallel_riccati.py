"""Parallel (associative-scan) Riccati backward pass.

The reference's backward recursion is strictly serial over the horizon
(``back_pass.c:69-252``); SURVEY.md section 5 names the associative-scan
parallel Riccati formulations (PAPERS.md: "The Parallelization of Riccati
Recursion", arXiv:1809.06360; "A Parallel Riccati Factorization Algorithm
with Applications to Model Predictive Control", arXiv:1407.6898; cf. also
Sarkka & Garcia-Fernandez's temporal parallelization of LQT) as the upgrade
path for long horizons: O(log N) depth instead of O(N).

Scope: the LQ subproblem solved by the backward pass at fixed derivatives is
linear-quadratic exactly when

* there are no input box constraints (``n_h == 0`` -- boxQP clamping is a
  per-step nonlinearity that breaks associativity), and
* ``full_ddp == False`` (the FULL_DDP tensor terms make the effective stage
  cost depend on the downstream ``Vx``).

Within that scope each step contributes a *conditional value function*
element ``(A, b, C, eta, J)`` representing

    V_{i->j}(x_i, x_j) = 1/2 x_i^T J x_i - eta^T x_i
                         + 1/2 (x_j - A x_i - b)^T C^+ (x_j - A x_i - b)

closed under the associative combination below; a reverse
``lax.associative_scan`` then yields the value function at EVERY step in
O(log N) depth, after which gains/dV/g_norm are recovered with one
embarrassingly-parallel ``vmap`` (reusing the exact serial gain assembly,
including the boxQP call with infinite bounds, so results coincide with the
serial pass).

Regularization note: regType 1's ``QuuF = Quu + lambda*I`` is folded into the
stage control cost (``cuu + lambda*I``), which also makes the *propagated*
value function use the regularized Quu.  The reference instead propagates
with the UNregularized Quu (``back_pass.c:217-241``), so for ``lambda > 0``
the parallel pass is a (still valid, descent-producing) variant; at
``lambda == 0`` -- the common case near convergence -- both recursions are
identical.  Covered by tests against the serial pass.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .boxqp import BoxQPHyper, boxqp
from .backpass import BackPassResult
from ..derivs import DerivBundle

Array = jax.Array


class _Element(NamedTuple):
    A: Array  # (n_x, n_x)
    b: Array  # (n_x,)
    C: Array  # (n_x, n_x)
    eta: Array  # (n_x,)
    J: Array  # (n_x, n_x)


def _combine(e1: _Element, e2: _Element) -> _Element:
    """Associative composition: e1 spans i->k (earlier), e2 spans k->j."""
    n = e1.A.shape[-1]
    eye = jnp.eye(n, dtype=e1.A.dtype)
    M = jnp.linalg.solve((eye + e1.C @ e2.J).T, e2.A.T).T  # A2 (I + C1 J2)^-1
    Nt = jnp.linalg.solve((eye + e2.J @ e1.C).T, e1.A).T  # A1^T (I + J2 C1)^-1
    A = M @ e1.A
    b = M @ (e1.b + e1.C @ e2.eta) + e2.b
    C = M @ e1.C @ e2.A.T + e2.C
    eta = Nt @ (e2.eta - e2.J @ e1.b) + e1.eta
    J = Nt @ e2.J @ e1.A + e1.J
    J = 0.5 * (J + J.T)
    C = 0.5 * (C + C.T)
    return _Element(A=A, b=b, C=C, eta=eta, J=J)


def _make_elements(sd, lam, reg_type) -> _Element:
    """Per-step elements from the derivative bundle (stacked over N)."""

    def one(fx, fu, cx, cu, cxx, cuu, cxu):
        n_u = cu.shape[0]
        dtype = cu.dtype
        if reg_type == 2:
            cuu_r = cuu + lam * fu.T @ fu  # folded regType 2 (approximate:
            # the exact reference form also shifts Qxu; see module docstring)
        else:
            cuu_r = cuu + lam * jnp.eye(n_u, dtype=dtype)
        cuu_inv = jnp.linalg.inv(cuu_r)
        A = fx - fu @ cuu_inv @ cxu.T
        b = -fu @ (cuu_inv @ cu)
        C = fu @ cuu_inv @ fu.T
        J = cxx - cxu @ cuu_inv @ cxu.T
        eta = -(cx - cxu @ (cuu_inv @ cu))
        J = 0.5 * (J + J.T)
        C = 0.5 * (C + C.T)
        return _Element(A=A, b=b, C=C, eta=eta, J=J)

    return jax.vmap(one)(sd.fx, sd.fu, sd.cx, sd.cu, sd.cxx, sd.cuu, sd.cxu)


def parallel_back_pass(
    derivs: DerivBundle,
    us: Array,
    lam: Array,
    reg_type: int,
    hyper: BoxQPHyper = BoxQPHyper(),
) -> BackPassResult:
    """O(log N)-depth backward pass for unconstrained problems.

    Drop-in interface-compatible with :func:`..backpass.back_pass` (same
    BackPassResult), valid when the problem has no ``h`` constraints and
    ``full_ddp=False``.
    """
    sd = derivs.step
    N, n_u = us.shape
    n_x = sd.fx.shape[-1]
    dtype = us.dtype

    elems = _make_elements(sd, lam, reg_type)
    # Final-cost element appended at index N.
    final = _Element(
        A=jnp.zeros((1, n_x, n_x), dtype),
        b=jnp.zeros((1, n_x), dtype),
        C=jnp.zeros((1, n_x, n_x), dtype),
        eta=-derivs.final.cx[None],
        J=derivs.final.cxx[None],
    )
    all_e = jax.tree_util.tree_map(
        lambda a, f: jnp.concatenate([a, f], axis=0), elems, final
    )
    # Suffix combination: result[k] = e_k . e_{k+1} . ... . e_N.
    # NB associative_scan(reverse=True) passes operands with the LATER
    # segment first; _combine takes (earlier, later), hence the flip.
    suff = lax.associative_scan(
        jax.vmap(lambda a, b: _combine(b, a)), all_e, reverse=True, axis=0
    )
    Vx_all = -suff.eta  # (N+1, n_x); V_k(dx) = 1/2 dx^T J dx - eta^T dx
    Vxx_all = suff.J

    ok_scan = jnp.all(jnp.isfinite(Vx_all)) & jnp.all(jnp.isfinite(Vxx_all))

    # Per-step gains from V_{k+1}, identical assembly to the serial pass
    # (unconstrained: infinite bounds -> boxQP reduces to the free solve).
    inf = jnp.full((n_u,), jnp.inf, dtype)

    def gains(fx, fu, cx, cu, cxx, cuu, cxu, u_k, Vx1, Vxx1):
        Qu = cu + fu.T @ Vx1
        Qxu = cxu + fx.T @ Vxx1 @ fu
        Quu = cuu + fu.T @ Vxx1 @ fu
        if reg_type == 2:
            QuuF = Quu + lam * fu.T @ fu
            Qxu_reg = Qxu + lam * fx.T @ fu
        else:
            QuuF = Quu + lam * jnp.eye(n_u, dtype=dtype)
            Qxu_reg = Qxu
        qp = boxqp(QuuF, Qu, -inf, inf, jnp.zeros((n_u,), dtype), hyper)
        l_k = qp.x
        L_k = -qp.inv_h_free @ Qxu_reg.T
        dV_k = jnp.stack([l_k @ Qu, 0.5 * l_k @ (Quu @ l_k)])
        g_k = jnp.max(jnp.abs(l_k) / (jnp.abs(u_k) + 1.0))
        return l_k, L_k, dV_k, g_k, qp.res < 1

    ls, Ls, dVs, gs, fails = jax.vmap(gains)(
        sd.fx, sd.fu, sd.cx, sd.cu, sd.cxx, sd.cuu, sd.cxu, us,
        Vx_all[1:], Vxx_all[1:],
    )
    failed = jnp.any(fails) | ~ok_scan
    return BackPassResult(
        l=ls,
        L=Ls,
        dV=jnp.sum(dVs, axis=0),
        g_norm=jnp.sum(gs) / jnp.asarray(N - 1, dtype),
        failed=failed,
    )
