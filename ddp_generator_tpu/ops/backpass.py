"""Backward pass: Riccati-like recursion with control-limited boxQP gains.

Faithful TPU-native re-derivation of ``back_pass.c:38-257`` as a reverse
``lax.scan`` over the horizon.  Per step k (cf. ``back_pass.c:80-241``)::

    Qu  = cu + fu^T Vx
    Qx  = cx + fx^T Vx
    Qxu = cxu + fx^T Vxx fu   (+ Vx . fxu   when FULL_DDP)
    Quu = cuu + fu^T Vxx fu   (+ Vx . fuu)
    Qxx = cxx + fx^T Vxx fx   (+ Vx . fxx)

regularization (``back_pass.c:133-159``)::

    regType 1: QuuF = Quu + lambda*I
    regType 2: QuuF = Quu + lambda*fu^T fu ; Qxu_reg = Qxu + lambda*fx^T fu

feedforward ``l`` from boxQP on (QuuF, Qu) warm-started from step k+1
(``back_pass.c:163-171``), feedback ``L`` with clamped rows following the
state-dependent constraint boundary (``back_pass.c:175-201``).  With

    D[j,:] = sign_j * hx_j   for clamped input j (0 for free j),

the loop nest at ``back_pass.c:175-201`` is exactly::

    L = -invH_free @ (Qxu_reg^T - QuuF @ D) - D

(free rows: -invH Qxu_reg^T plus the cross-term through clamped inputs;
clamped rows: -D since invH_free has zero clamped rows).

Value-function update uses the UNregularized Quu/Qxu (``back_pass.c:217-241``)
and dV accumulation ``[l^T Qu, 0.5 l^T Quu l]`` (``back_pass.c:204-215``).
Gradient norm: ``mean_k max_i |l_i|/(|u_i|+1)`` with the reference's exact
``/(n_hor-1)`` divisor (``back_pass.c:244-254``).

boxQP failure (res < 1) at any step makes the whole pass fail -> outer loop
raises lambda (``back_pass.c:168-171``, ``iLQG.c:272-275``); remaining steps
are masked to pass state through unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .boxqp import BoxQPHyper, boxqp
from ..derivs import DerivBundle

Array = jax.Array


class BackPassResult(NamedTuple):
    l: Array  # (N, n_u) feedforward
    L: Array  # (N, n_u, n_x) feedback
    dV: Array  # (2,) expected-reduction coefficients
    g_norm: Array  # scalar
    failed: Array  # scalar bool (any boxQP res < 1)


def back_pass(
    derivs: DerivBundle,
    us: Array,  # (N, n_u) nominal inputs (for g_norm)
    lam: Array,  # scalar lambda
    reg_type: int,
    full_ddp: bool,
    hyper: BoxQPHyper = BoxQPHyper(),
    unroll: int = 1,
) -> BackPassResult:
    sd = derivs.step
    N, n_u = us.shape
    n_x = sd.fx.shape[-1]
    dtype = us.dtype

    Vx0 = derivs.final.cx
    Vxx0 = derivs.final.cxx

    def body(carry, inp):
        Vx, Vxx, l_next, dV, g_sum, failed = carry
        (fx, fu, cx, cu, cxx, cuu, cxu, fxx, fuu, fxu,
         lower, upper, lower_hx, upper_hx, lower_sign, upper_sign, u_k, is_last) = inp

        Qu = cu + fu.T @ Vx
        Qx = cx + fx.T @ Vx
        Qxu = cxu + fx.T @ Vxx @ fu
        Quu = cuu + fu.T @ Vxx @ fu
        Qxx = cxx + fx.T @ Vxx @ fx
        if full_ddp:
            # Vx . fxu etc: contract over the dynamics output index
            # (back_pass.c:95-131)
            Qxu = Qxu + jnp.einsum("i,ijk->jk", Vx, fxu)
            Quu = Quu + jnp.einsum("i,ijk->jk", Vx, fuu)
            Qxx = Qxx + jnp.einsum("i,ijk->jk", Vx, fxx)

        if reg_type == 2:
            QuuF = Quu + lam * fu.T @ fu
            Qxu_reg = Qxu + lam * fx.T @ fu
        else:
            QuuF = Quu + lam * jnp.eye(n_u, dtype=dtype)
            Qxu_reg = Qxu

        # boxQP warm start: zero at the last step, else l from step k+1
        # (back_pass.c:163-166)
        l_init = jnp.where(is_last, jnp.zeros((n_u,), dtype), l_next)
        qp = boxqp(QuuF, Qu, lower, upper, l_init, hyper)
        step_failed = qp.res < 1

        # Clamped-input constraint-boundary direction D (back_pass.c:193-199)
        D = jnp.where(
            (qp.clamped == 1)[:, None],
            lower_sign[:, None] * lower_hx,
            jnp.where(
                (qp.clamped == 2)[:, None],
                upper_sign[:, None] * upper_hx,
                jnp.zeros((n_u, n_x), dtype),
            ),
        )
        L_k = -qp.inv_h_free @ (Qxu_reg.T - QuuF @ D) - D

        l_k = qp.x
        dV_k = jnp.stack([l_k @ Qu, 0.5 * l_k @ (Quu @ l_k)])

        # Value function update with unregularized Quu/Qxu
        # (back_pass.c:217-241)
        Quu_l = Quu @ l_k
        Vx_new = Qx + L_k.T @ Quu_l + L_k.T @ Qu + Qxu @ l_k
        Vxx_new = Qxx + L_k.T @ Quu @ L_k + L_k.T @ Qxu.T + Qxu @ L_k
        Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)

        g_k = jnp.max(jnp.abs(l_k) / (jnp.abs(u_k) + 1.0))

        # On failure: freeze state (results are discarded by the caller
        # anyway; this keeps NaNs from propagating through the scan).
        dead = failed | step_failed
        keep = lambda new, old: jnp.where(dead, old, new)
        carry_new = (
            keep(Vx_new, Vx),
            keep(Vxx_new, Vxx),
            keep(l_k, l_next),
            keep(dV + dV_k, dV),
            keep(g_sum + g_k, g_sum),
            dead,
        )
        return carry_new, (keep(l_k, jnp.zeros_like(l_k)),
                           keep(L_k, jnp.zeros_like(L_k)))

    is_last = jnp.zeros((N,), bool).at[N - 1].set(True)
    xs_in = (
        sd.fx, sd.fu, sd.cx, sd.cu, sd.cxx, sd.cuu, sd.cxu,
        sd.fxx, sd.fuu, sd.fxu,
        sd.lower, sd.upper, sd.lower_hx, sd.upper_hx,
        sd.lower_sign, sd.upper_sign, us, is_last,
    )
    init = (
        Vx0,
        Vxx0,
        jnp.zeros((n_u,), dtype),
        jnp.zeros((2,), dtype),
        jnp.zeros((), dtype),
        jnp.zeros((), bool),
    )
    (Vx, Vxx, _l, dV, g_sum, failed), (ls, Ls) = lax.scan(
        body, init, xs_in, reverse=True, unroll=unroll
    )
    g_norm = g_sum / jnp.asarray(N - 1, dtype)
    return BackPassResult(l=ls, L=Ls, dV=dV, g_norm=g_norm, failed=failed)
