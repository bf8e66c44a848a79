"""Deep per-step numeric inspection of the backward pass.

The reference's ``DEBUG_BACKPASS`` / ``DEBUG_BOXQP`` compile flags
(``back_pass.c:26-36``, ``boxQP.c:25-35``) printf every intermediate (Qx, Qu,
Qxx, Quu, Qxu, the regularized QuuF, the QP result, gains, Vx, Vxx) at every
step -- the way you debug a solve gone wrong.  In a jitted TPU program the
equivalent is not printing but *returning* the intermediates: this module
reruns ONE backward pass outside the solver loop and hands back everything as
stacked arrays, which beats a console dump (slice, diff, plot it).

Typical post-mortem for a failing lane ``b`` of a batched solve::

    tr = backpass_trace(problem, options, xs[b], us[b], lam[b], params)
    print(format_backpass_step(tr, k))       # DEBUG_BACKPASS-style dump
    bad = np.flatnonzero(np.asarray(tr.res) < 1)   # steps whose boxQP failed

Any step's QP can then be replayed standalone against
:func:`ddp_generator_tpu.ops.boxqp.boxqp` with the exact inputs recorded here
(``QuuF[k], Qu[k], lower[k], upper[k], l[k+1]``) -- that is the
``DEBUG_BOXQP`` workflow (per-iteration Newton state) on demand.

For multiplier/penalty state use the live values from a
:class:`~ddp_generator_tpu.solution.Solution` (``w_pen_l``, ``w_pen_f``) or
defaults for unconstrained problems.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .al import init_multipliers
from .derivs import calc_derivs
from .options import SolverOptions
from .problem import Problem
from .solver import _boxqp_hyper
from .ops.boxqp import boxqp
from .utils.debug import format_mat, format_vec

Array = jax.Array


class BackPassTrace(NamedTuple):
    """All per-step intermediates of one backward pass, stacked over k
    (leading dim N; the recursion runs k = N-1 .. 0)."""

    Qx: Array    # (N, n_x)
    Qu: Array    # (N, n_u)
    Qxx: Array   # (N, n_x, n_x)
    Quu: Array   # (N, n_u, n_u)
    Qxu: Array   # (N, n_x, n_u)
    QuuF: Array  # (N, n_u, n_u) regularized (back_pass.c:133-159)
    Qxu_reg: Array
    lower: Array  # (N, n_u) boxQP bounds (relative to nominal u)
    upper: Array
    l: Array     # (N, n_u) feedforward
    L: Array     # (N, n_u, n_x) feedback
    res: Array   # (N,) boxQP result code (boxQP.c result taxonomy)
    clamped: Array  # (N, n_u) 0 free / 1 at lower / 2 at upper
    Vx: Array    # (N, n_x) cost-to-go gradient ENTERING step k (i.e. V_{k+1})
    Vxx: Array   # (N, n_x, n_x)
    dV: Array    # (N, 2) per-step expected-reduction contributions
    g: Array     # (N,) per-step gradient-norm contributions


def backpass_trace(
    problem: Problem,
    options: SolverOptions,
    xs: Array,  # (N+1, n_x) nominal trajectory
    us: Array,  # (N, n_u)
    lam,
    params: Any,
    mult=None,
    w_pen_l=None,
    w_pen_f=None,
) -> BackPassTrace:
    """Rerun one backward pass, returning every intermediate per step.

    Semantically identical to the solver's in-loop pass
    (``ops/backpass.py``); kept separate so the hot path never pays for
    tracing.  ``mult`` defaults to fresh multipliers (unconstrained
    problems don't care)."""
    o = options
    dtype = jnp.dtype(o.dtype)
    xs = jnp.asarray(xs, dtype)
    us = jnp.asarray(us, dtype)
    lam = jnp.asarray(lam, dtype)
    N = us.shape[0]
    n_x, n_u = problem.n_x, problem.n_u
    hyper = _boxqp_hyper(o)
    if mult is None:
        mult = init_multipliers(problem, N, dtype)
    if w_pen_l is None:
        w_pen_l = jnp.asarray(o.w_pen_init_l, dtype)
    if w_pen_f is None:
        w_pen_f = jnp.asarray(o.w_pen_init_f, dtype)

    @functools.partial(jax.jit, static_argnums=())
    def run(xs, us, lam, w_pen_l, w_pen_f):
        derivs = calc_derivs(
            problem, xs, us, params,
            mult.mu_le, mult.mu_li, mult.mu_fe, mult.mu_fi,
            w_pen_l, w_pen_f, o.full_ddp,
        )
        sd = derivs.step

        def body(carry, inp):
            Vx, Vxx, l_next = carry
            (fx, fu, cx, cu, cxx, cuu, cxu, fxx, fuu, fxu,
             lower, upper, lower_hx, upper_hx, lower_sign, upper_sign,
             u_k, is_last) = inp

            Qu = cu + fu.T @ Vx
            Qx = cx + fx.T @ Vx
            Qxu = cxu + fx.T @ Vxx @ fu
            Quu = cuu + fu.T @ Vxx @ fu
            Qxx = cxx + fx.T @ Vxx @ fx
            if o.full_ddp:
                Qxu = Qxu + jnp.einsum("i,ijk->jk", Vx, fxu)
                Quu = Quu + jnp.einsum("i,ijk->jk", Vx, fuu)
                Qxx = Qxx + jnp.einsum("i,ijk->jk", Vx, fxx)
            if o.regType == 2:
                QuuF = Quu + lam * fu.T @ fu
                Qxu_reg = Qxu + lam * fx.T @ fu
            else:
                QuuF = Quu + lam * jnp.eye(n_u, dtype=dtype)
                Qxu_reg = Qxu

            l_init = jnp.where(is_last, jnp.zeros((n_u,), dtype), l_next)
            qp = boxqp(QuuF, Qu, lower, upper, l_init, hyper)
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
            Quu_l = Quu @ l_k
            Vx_new = Qx + L_k.T @ Quu_l + L_k.T @ Qu + Qxu @ l_k
            Vxx_new = Qxx + L_k.T @ Quu @ L_k + L_k.T @ Qxu.T + Qxu @ L_k
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
            g_k = jnp.max(jnp.abs(l_k) / (jnp.abs(u_k) + 1.0))

            out = BackPassTrace(
                Qx=Qx, Qu=Qu, Qxx=Qxx, Quu=Quu, Qxu=Qxu,
                QuuF=QuuF, Qxu_reg=Qxu_reg, lower=lower, upper=upper,
                l=l_k, L=L_k, res=qp.res, clamped=qp.clamped,
                Vx=Vx, Vxx=Vxx, dV=dV_k, g=g_k,
            )
            return (Vx_new, Vxx_new, l_k), out

        is_last = jnp.zeros((N,), bool).at[N - 1].set(True)
        xs_in = (
            sd.fx, sd.fu, sd.cx, sd.cu, sd.cxx, sd.cuu, sd.cxu,
            sd.fxx, sd.fuu, sd.fxu,
            sd.lower, sd.upper, sd.lower_hx, sd.upper_hx,
            sd.lower_sign, sd.upper_sign, us, is_last,
        )
        init = (derivs.final.cx, derivs.final.cxx, jnp.zeros((n_u,), dtype))
        _, trace = lax.scan(body, init, xs_in, reverse=True)
        return trace

    return run(xs, us, lam, w_pen_l, w_pen_f)


def format_backpass_step(tr: BackPassTrace, k: int) -> str:
    """DEBUG_BACKPASS-style dump of step k (back_pass.c:26-36 content)."""
    import numpy as np

    clamp_names = {0: "free", 1: "lower", 2: "upper"}
    clamped = [clamp_names[int(c)] for c in np.asarray(tr.clamped[k])]
    lines = [
        f"== back_pass step k={k} ==",
        format_vec(tr.Vx[k], "Vx(k+1)"),
        format_mat(tr.Vxx[k], "Vxx(k+1)"),
        format_vec(tr.Qx[k], "Qx"),
        format_vec(tr.Qu[k], "Qu"),
        format_mat(tr.Qxx[k], "Qxx"),
        format_mat(tr.Quu[k], "Quu"),
        format_mat(tr.Qxu[k], "Qxu"),
        format_mat(tr.QuuF[k], "QuuF (regularized)"),
        format_vec(tr.lower[k], "boxQP lower"),
        format_vec(tr.upper[k], "boxQP upper"),
        f"boxQP res= {int(tr.res[k])}  clamped= {clamped}",
        format_vec(tr.l[k], "l"),
        format_mat(tr.L[k], "L"),
        format_vec(tr.dV[k], "dV contribution"),
        f"g contribution= {float(tr.g[k]):.6g}",
    ]
    return "\n".join(lines)
