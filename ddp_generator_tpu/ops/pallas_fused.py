"""Pallas TPU kernel: derivatives + backward pass fused into ONE kernel.

``calc_derivs`` writes a ~180-component-per-step derivative bundle to HBM
(hundreds of MB at production batch sizes) that the backward-pass kernel
immediately transposes and streams back in -- at batch 2048 the bundle
write + transpose + re-read traffic rivals the backward pass' compute.
This kernel computes the derivatives ON THE FLY inside the backward
recursion: per (reverse) grid step it reads only the nominal ``(x, u)``
pair (+ AL multipliers), differentiates the user's dynamics/cost with
nested ``jax.jvp`` along component basis directions, derives the box
limits, and feeds the result straight into the shared
:func:`pallas_backpass.riccati_step`.  The bundle never exists in memory.

Semantics notes:

* identical math to ``calc_derivs`` + ``back_pass`` (``iLQG_func.tem:
  187-221`` + ``back_pass.c:38-257``): the derivative bundle was only ever
  consumed by the backward pass, so fusing is behavior-preserving;
* the reference's stale-derivative rule costs nothing here: the fused pass
  simply re-evaluates at the unchanged ``(xs, us, mu, w_pen_d)`` on
  reject/λ-retry iterations;
* user functions trace through :func:`pallas_math.pallas_safe` (asin & co
  substitution); ``jax.jvp`` differentiates through the substitutions, so
  derivative values match the kernel's own primal arithmetic;
* the per-step NaN/Inf guard of the generated ``calc_derivs``
  (``genenerator_main.mac:193-198``) becomes a per-lane ``derivs_ok`` flag
  accumulated over all steps, reported separately from the boxQP
  ``failed`` flag so the solver preserves the reference's status ordering
  (derivative failure aborts, iLQG.c:247-249; backpass failure raises λ).

Scope: shared (unbatched) params, n_u <= 3 (closed-form QP), float32 on
real TPUs (Mosaic), any dtype in interpret mode.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..al import _eq_penalty, _ineq_penalty
from ..problem import Problem
from .backpass import BackPassResult
from .pallas_backpass import riccati_step
from .pallas_math import pallas_safe
from .pallas_rollout import _normalize_leaf, _read_leaf

Array = jax.Array


def _basis(n: int, j: int, like: Array) -> Array:
    """One-hot along the component axis of an (n, B) array (lane-broadcast).

    Built by concatenating ones/zeros rows: Pallas forbids captured array
    constants, and the obvious iota-comparison construction miscompiles when
    used as a jvp tangent (Mosaic SIGABRT, observed on v5e)."""
    rows = [
        jnp.ones_like(like[0:1]) if a == j else jnp.zeros_like(like[0:1])
        for a in range(like.shape[0])
    ]
    return jnp.concatenate(rows, axis=0)


class _Safes:
    """pallas_safe-wrapped problem functions (built once per kernel)."""

    def __init__(self, problem: Problem):
        self.f = pallas_safe(problem.f)
        self.L = pallas_safe(problem.L)
        self.F = pallas_safe(problem.F)
        self.h = [pallas_safe(bc.fn) for bc in problem.box_constraints]
        self.hle = [pallas_safe(fn) for fn in problem.hle]
        self.hli = [pallas_safe(fn) for fn in problem.hli]
        self.hfe = [pallas_safe(fn) for fn in problem.hfe]
        self.hfi = [pallas_safe(fn) for fn in problem.hfi]


def _box_limit_components(
    problem: Problem,
    safes,
    x_arr: Array,  # (n_x, B)
    u_arr: Array,  # (n_u, B)
    p: Any,
    k,
    np_dtype,
):
    """Box limits as lane-vector components (limitsU, iLQG_func.tem:75-119).

    Returns ``(lower, upper, lo_hx, up_hx, lo_s, up_s)`` with bounds
    relative to the current ``u``."""
    NX, NU = problem.n_x, problem.n_u
    ex = lambda j: _basis(NX, j, x_arr)
    zeros = jnp.zeros_like(x_arr[0])
    big = jnp.zeros_like(zeros) + np.asarray(np.inf, np_dtype)
    lower = [-big for _ in range(NU)]
    upper = [big for _ in range(NU)]
    lo_hx = [[zeros for _ in range(NX)] for _ in range(NU)]
    up_hx = [[zeros for _ in range(NX)] for _ in range(NU)]
    lo_s = [zeros for _ in range(NU)]
    up_s = [zeros for _ in range(NU)]
    for bc, hs in zip(problem.box_constraints, safes.h):
        hval = hs(x_arr, u_arr, p, k)
        lim = -bc.sign * (hval - bc.sign * u_arr[bc.u_index])
        _, h_lin = jax.linearize(lambda xx: hs(xx, u_arr, p, k), x_arr)
        hx_cols = [h_lin(ex(b)) for b in range(NX)]
        j = bc.u_index
        sgn = jnp.zeros_like(zeros) + np.asarray(bc.sign, np_dtype)
        # jnp.where, NOT a+t*(b-a): the untightened bound is +-inf and
        # inf - inf would poison the arithmetic form with NaNs.
        if bc.sign > 0:
            tighter = lim < upper[j]
            upper[j] = jnp.where(tighter, lim, upper[j])
            up_s[j] = jnp.where(tighter, sgn, up_s[j])
            for b in range(NX):
                up_hx[j][b] = jnp.where(tighter, hx_cols[b], up_hx[j][b])
        else:
            tighter = lim > lower[j]
            lower[j] = jnp.where(tighter, lim, lower[j])
            lo_s[j] = jnp.where(tighter, sgn, lo_s[j])
            for b in range(NX):
                lo_hx[j][b] = jnp.where(tighter, hx_cols[b], lo_hx[j][b])
    # bounds relative to current u (iLQG_func.tem:91-94)
    lower = [lower[a] - u_arr[a] for a in range(NU)]
    upper = [upper[a] - u_arr[a] for a in range(NU)]
    return lower, upper, lo_hx, up_hx, lo_s, up_s


def step_derivative_components(
    problem: Problem,
    safes: _Safes,
    x_arr: Array,  # (n_x, B)
    u_arr: Array,  # (n_u, B)
    p: Any,
    k,
    mu_le_rows,  # list of (B,) per running-equality constraint
    mu_li_rows,
    wpl: Array,  # (B,)
    full_ddp: bool,
    np_dtype,
):
    """All per-step derivative objects as component lane-vector lists.

    The in-kernel replacement for ``calc_derivs``'s per-step work
    (bp_derivsL + limitsU): nested ``jax.jvp`` along component basis
    directions; testable outside Pallas (plain jnp).

    Returns ``(fx, fu, cx, cu, cxx, cuu, cxu, fxx, fuu, fxu,
    lower, upper, lo_hx, up_hx, lo_s, up_s, dok)``.
    """
    NX, NU = problem.n_x, problem.n_u

    def f_fn(xx, uu):
        return safes.f(xx, uu, p, k)

    def L_fn(xx, uu):
        c = safes.L(xx, uu, p, k)
        for idx, fn in enumerate(safes.hle):
            c = c + _eq_penalty(mu_le_rows[idx], fn(xx, uu, p, k), wpl)
        for idx, fn in enumerate(safes.hli):
            c = c + _ineq_penalty(mu_li_rows[idx], fn(xx, uu, p, k), wpl)
        return c

    ex = lambda j: _basis(NX, j, x_arr)
    eu = lambda j: _basis(NU, j, u_arr)
    zx = jnp.zeros_like(x_arr)
    zu = jnp.zeros_like(u_arr)

    # ``jax.linearize`` (NOT repeated jvp): each direction family traces the
    # nonlinear function ONCE and tangent applications are cheap linear
    # evaluations -- repeated-jvp tracing produced a kernel big enough to
    # SIGABRT the Mosaic compiler at production shapes.

    # first-order dynamics Jacobian columns
    _, f_lin = jax.linearize(f_fn, x_arr, u_arr)
    fx_cols = [f_lin(ex(j), zu) for j in range(NX)]  # each (n_x, B)
    fu_cols = [f_lin(zx, eu(j)) for j in range(NU)]
    fx = [[fx_cols[b][a] for b in range(NX)] for a in range(NX)]
    fu = [[fu_cols[b][a] for b in range(NU)] for a in range(NX)]

    if full_ddp:
        fxx = [[[None] * NX for _ in range(NX)] for _ in range(NX)]
        fxu = [[[None] * NU for _ in range(NX)] for _ in range(NX)]
        fuu = [[[None] * NU for _ in range(NU)] for _ in range(NX)]
        for a in range(NX):
            # directional derivative of f along e_a (x), then linearize it
            da = lambda xx, uu, a=a: jax.jvp(
                f_fn, (xx, uu), (_basis(NX, a, xx), jnp.zeros_like(uu))
            )[1]
            _, da_lin = jax.linearize(da, x_arr, u_arr)
            for b in range(a, NX):
                t = da_lin(ex(b), zu)
                for i_ in range(NX):
                    fxx[i_][a][b] = t[i_]
                    fxx[i_][b][a] = t[i_]
            for b in range(NU):
                t = da_lin(zx, eu(b))
                for i_ in range(NX):
                    fxu[i_][a][b] = t[i_]
        for a in range(NU):
            da = lambda xx, uu, a=a: jax.jvp(
                f_fn, (xx, uu), (jnp.zeros_like(xx), _basis(NU, a, uu))
            )[1]
            _, da_lin = jax.linearize(da, x_arr, u_arr)
            for b in range(a, NU):
                t = da_lin(zx, eu(b))
                for i_ in range(NX):
                    fuu[i_][a][b] = t[i_]
                    fuu[i_][b][a] = t[i_]
    else:
        fxx = fuu = fxu = None

    # cost derivatives
    _, L_lin = jax.linearize(L_fn, x_arr, u_arr)
    cx = [L_lin(ex(a), zu) for a in range(NX)]
    cu = [L_lin(zx, eu(a)) for a in range(NU)]
    cxx = [[None] * NX for _ in range(NX)]
    cxu = [[None] * NU for _ in range(NX)]
    cuu = [[None] * NU for _ in range(NU)]
    for a in range(NX):
        da = lambda xx, uu, a=a: jax.jvp(
            L_fn, (xx, uu), (_basis(NX, a, xx), jnp.zeros_like(uu))
        )[1]
        _, da_lin = jax.linearize(da, x_arr, u_arr)
        for b in range(a, NX):
            cxx[a][b] = cxx[b][a] = da_lin(ex(b), zu)
        for b in range(NU):
            cxu[a][b] = da_lin(zx, eu(b))
    for a in range(NU):
        da = lambda xx, uu, a=a: jax.jvp(
            L_fn, (xx, uu), (jnp.zeros_like(xx), _basis(NU, a, uu))
        )[1]
        _, da_lin = jax.linearize(da, x_arr, u_arr)
        for b in range(a, NU):
            cuu[a][b] = cuu[b][a] = da_lin(zx, eu(b))

    lower, upper, lo_hx, up_hx, lo_s, up_s = _box_limit_components(
        problem, safes, x_arr, u_arr, p, k, np_dtype
    )

    # derivative NaN/Inf guard over every object (calc_derivs ok flag)
    zeros = jnp.zeros_like(x_arr[0])
    dok = jnp.ones_like(zeros)
    for grp in (fx, fu, cxx, cuu, cxu):
        for row in grp:
            for v in row:
                dok = dok * jnp.isfinite(v).astype(np_dtype)
    for v in cx + cu:
        dok = dok * jnp.isfinite(v).astype(np_dtype)
    if full_ddp:
        for t3 in (fxx, fuu, fxu):
            for m2 in t3:
                for row in m2:
                    for v in row:
                        dok = dok * jnp.isfinite(v).astype(np_dtype)

    return (fx, fu, cx, cu, cxx, cuu, cxu, fxx, fuu, fxu,
            lower, upper, lo_hx, up_hx, lo_s, up_s, dok)


def step_derivative_components_shared(
    problem: Problem,
    safes,
    x_arr: Array,  # (n_x, B)
    u_arr: Array,  # (n_u, B)
    p: Any,
    k,
    mu_le_rows,
    mu_li_rows,
    wpl: Array,  # (B,)
    full_ddp: bool,
    np_dtype,
):
    """:func:`step_derivative_components` with a SINGLE shared primal trace.

    The per-family version evaluates the user's nonlinear ``f``/``L`` once
    per ``jax.linearize`` family (~13 times for a FULL_DDP 4x2 problem) and
    XLA does not CSE the duplicated transcendentals across families: the
    compiled CarParking emission carries ~183 sin/cos instructions per
    (step, lane) vs ~57 here.  **Measured outcome on TPU (v5e, B=2048,
    N=500): the per-family version wins by 12x anyway** (0.91 ms -- the
    bundle write-bandwidth floor -- vs 10.8 ms): the emission is
    HBM-write-bound, not transcendental-bound, and this vmapped-linearize
    tower lowers to layouts XLA schedules far worse than the straight-line
    per-family code.  Kept as a documented negative result and CPU-path
    A/B (``SolverOptions.derivs_emitter="shared"``).

    Here the nonlinear functions are traced ONCE:

    * ``fo(x, u)`` linearizes ``(f, L)`` jointly and returns the primal
      plus every first-order column -- all columns are linear applications
      on one set of shared residuals;
    * one outer ``jax.linearize(fo)`` then yields every second-order
      object as tangent applications on the same residuals (the cos/sin
      values introduced by derivative rules are computed once and shared
      by construction, not by hoping for CSE).

    Output contract is identical to :func:`step_derivative_components`;
    values agree to float roundoff (association order differs).
    """
    NX, NU = problem.n_x, problem.n_u
    D = NX + NU

    def f_fn(xx, uu):
        return safes.f(xx, uu, p, k)

    def L_fn(xx, uu):
        c = safes.L(xx, uu, p, k)
        for idx, fn in enumerate(safes.hle):
            c = c + _eq_penalty(mu_le_rows[idx], fn(xx, uu, p, k), wpl)
        for idx, fn in enumerate(safes.hli):
            c = c + _ineq_penalty(mu_li_rows[idx], fn(xx, uu, p, k), wpl)
        return c

    # Stacked basis directions (D, n_x, B)/(D, n_u, B): direction j is
    # (e_j, 0) for j < NX, (0, e_{j-NX}) after.  The linear maps below are
    # applied VMAPPED over this stack -- one copy of the tangent graph --
    # NOT once per direction: partial evaluation inlines a separate copy
    # per call site, and the residual-derivative terms the outer jvp
    # attaches to each copy (cos -> -sin etc.) defeat XLA CSE (measured:
    # per-call-site applications only got ~23% below the per-family
    # version's transcendental count; the vmapped form reaches the
    # distinct-subexpression floor).
    def basis_stack(like_x, like_u):
        dxs = jnp.stack(
            [_basis(NX, j, like_x) for j in range(NX)]
            + [jnp.zeros_like(like_x) for _ in range(NU)]
        )
        dus = jnp.stack(
            [jnp.zeros_like(like_u) for _ in range(NX)]
            + [_basis(NU, j, like_u) for j in range(NU)]
        )
        return dxs, dus

    def fo(xx, uu):
        _, lin = jax.linearize(
            lambda a, b: (f_fn(a, b), L_fn(a, b)), xx, uu
        )
        dxs, dus = basis_stack(xx, uu)
        return jax.vmap(lin)(dxs, dus)  # ((D, n_x, B), (D, B))

    (dF, dL), fo_lin = jax.linearize(fo, x_arr, u_arr)

    # first order: dF[b] = df/d dir_b, dL[b] = dL/d dir_b
    fx = [[dF[b, a] for b in range(NX)] for a in range(NX)]
    fu = [[dF[NX + b, a] for b in range(NU)] for a in range(NX)]
    cx = [dL[a] for a in range(NX)]
    cu = [dL[NX + a] for a in range(NU)]

    # second order: tangents of every first-order column along every
    # direction, again as ONE vmapped application of the linear map.
    dxs, dus = basis_stack(x_arr, u_arr)
    ddF, ddL = jax.vmap(fo_lin)(dxs, dus)  # (D, D, n_x, B), (D, D, B)

    cxx = [[None] * NX for _ in range(NX)]
    cxu = [[None] * NU for _ in range(NX)]
    cuu = [[None] * NU for _ in range(NU)]
    for a in range(NX):
        for b in range(a, NX):
            # one value per unordered pair, mirrored (matches the
            # per-family version's explicit symmetrization)
            cxx[a][b] = cxx[b][a] = ddL[a, b]
    for a in range(NU):
        for b in range(NX):
            cxu[b][a] = ddL[NX + a, b]
        for b in range(a, NU):
            cuu[a][b] = cuu[b][a] = ddL[NX + a, NX + b]

    if full_ddp:
        fxx = [[[None] * NX for _ in range(NX)] for _ in range(NX)]
        fxu = [[[None] * NU for _ in range(NX)] for _ in range(NX)]
        fuu = [[[None] * NU for _ in range(NU)] for _ in range(NX)]
        for a in range(NX):
            for b in range(a, NX):
                t = ddF[a, b]  # (n_x, B): d2 f / dx_a dx_b
                for i_ in range(NX):
                    fxx[i_][a][b] = fxx[i_][b][a] = t[i_]
        for b in range(NU):
            for a in range(NX):
                t = ddF[NX + b, a]  # d2 f / dx_a du_b
                for i_ in range(NX):
                    fxu[i_][a][b] = t[i_]
            for a in range(b, NU):
                t = ddF[NX + b, NX + a]  # d2 f / du_b du_a
                for i_ in range(NX):
                    fuu[i_][a][b] = fuu[i_][b][a] = t[i_]
    else:
        fxx = fuu = fxu = None

    lower, upper, lo_hx, up_hx, lo_s, up_s = _box_limit_components(
        problem, safes, x_arr, u_arr, p, k, np_dtype
    )

    # derivative NaN/Inf guard over every object (calc_derivs ok flag)
    dok = jnp.ones_like(x_arr[0])
    for grp in (fx, fu, cxx, cuu, cxu):
        for row in grp:
            for v in row:
                dok = dok * jnp.isfinite(v).astype(np_dtype)
    for v in cx + cu:
        dok = dok * jnp.isfinite(v).astype(np_dtype)
    if full_ddp:
        for t3 in (fxx, fuu, fxu):
            for m2 in t3:
                for row in m2:
                    for v in row:
                        dok = dok * jnp.isfinite(v).astype(np_dtype)

    return (fx, fu, cx, cu, cxx, cuu, cxu, fxx, fuu, fxu,
            lower, upper, lo_hx, up_hx, lo_s, up_s, dok)


def final_derivative_components(
    problem: Problem,
    safes: _Safes,
    xF: Array,  # (n_x, B)
    p: Any,
    N: int,
    mu_fe_rows,
    mu_fi_rows,
    wpf: Array,
    np_dtype,
):
    """Final-stage Fx/Fxx of the AL-augmented final cost (bp_derivsF role).

    Returns ``(Fx list, Fxx nested list, ok)``."""
    NX = problem.n_x

    def F_fn(xx):
        c = safes.F(xx, p, N)
        for idx, fn in enumerate(safes.hfe):
            c = c + _eq_penalty(mu_fe_rows[idx], fn(xx, p, N), wpf)
        for idx, fn in enumerate(safes.hfi):
            c = c + _ineq_penalty(mu_fi_rows[idx], fn(xx, p, N), wpf)
        return c

    okf = jnp.ones_like(xF[0])
    Fx = [None] * NX
    Fxx = [[None] * NX for _ in range(NX)]
    _, F_lin = jax.linearize(F_fn, xF)
    for a in range(NX):
        Fx[a] = F_lin(_basis(NX, a, xF))
        okf = okf * jnp.isfinite(Fx[a]).astype(np_dtype)
        g_fn = lambda xx, a=a: jax.jvp(F_fn, (xx,), (_basis(NX, a, xx),))[1]
        _, g_lin = jax.linearize(g_fn, xF)
        for b in range(a, NX):
            Fxx_ab = g_lin(_basis(NX, b, xF))
            Fxx[a][b] = Fxx[b][a] = Fxx_ab
            okf = okf * jnp.isfinite(Fxx_ab).astype(np_dtype)
    return Fx, Fxx, okf


def _make_fused_kernel(
    problem: Problem,
    N: int,
    leaf_shapes,
    np_dtype,
    reg_type: int,
    full_ddp: bool,
    treedef,
    S: int = 1,  # time steps per grid iteration (see pallas_backpass)
):
    n_x, n_u = problem.n_x, problem.n_u
    n_hle, n_hli = problem.n_hle, problem.n_hli
    n_hfe, n_hfi = problem.n_hfe, problem.n_hfi
    NX, NU = n_x, n_u
    safes = _Safes(problem)

    def kernel(*refs):
        it = iter(refs)
        x_ref, u_ref = next(it), next(it)
        mu_le_ref = next(it) if n_hle else None
        mu_li_ref = next(it) if n_hli else None
        xf_ref, wpl_ref, wpf_ref, lam_ref = (next(it) for _ in range(4))
        mu_fe_ref = next(it) if n_hfe else None
        mu_fi_ref = next(it) if n_hfi else None
        param_refs = [next(it) for _ in leaf_shapes]
        l_ref, L_ref, dv_ref, gnorm_ref, failed_ref, dok_ref = (
            next(it) for _ in range(6)
        )
        vx_s, vxx_s, dv_s, g_s, fail_s, dok_s = (next(it) for _ in range(6))

        i = pl.program_id(0)
        G = N // S
        lam = lam_ref[0, :]
        wpl = wpl_ref[0, :]
        wpf = wpf_ref[0, :]
        leaves = [
            _read_leaf(r, s, np_dtype) for r, s in zip(param_refs, leaf_shapes)
        ]
        p = jax.tree_util.tree_unflatten(treedef, leaves)

        XX = lambda a, b: a * NX + b

        @pl.when(i == 0)
        def _init():
            # final-stage derivatives Fx/Fxx (bp_derivsF role)
            xF = xf_ref[...]  # (n_x, B)
            mu_fe_rows = [mu_fe_ref[idx, :] for idx in range(n_hfe)]
            mu_fi_rows = [mu_fi_ref[idx, :] for idx in range(n_hfi)]
            Fx, Fxx, okf = final_derivative_components(
                problem, safes, xF, p, N, mu_fe_rows, mu_fi_rows, wpf,
                np_dtype,
            )
            for a in range(NX):
                vx_s[a, :] = Fx[a]
                for b in range(NX):
                    vxx_s[XX(a, b), :] = Fxx[a][b]
            dv_s[...] = jnp.zeros_like(dv_s)
            g_s[...] = jnp.zeros_like(g_s)
            fail_s[...] = jnp.zeros_like(fail_s)
            dok_s[0, :] = okf

        # In-register carries across the unrolled in-block steps; flushed
        # to VMEM scratch once per grid iteration (see pallas_backpass).
        Vx = [vx_s[a, :] for a in range(NX)]
        Vxx = [[vxx_s[XX(a, b), :] for b in range(NX)] for a in range(NX)]
        dv_acc = [dv_s[0, :], dv_s[1, :]]
        g_acc = g_s[0, :]
        fail_acc = fail_s[0, :]
        dok_acc = dok_s[0, :]

        for j in range(S - 1, -1, -1):
            # ---- per-step derivatives (bp_derivsL + limitsU roles) ----
            k = (G - 1 - i) * S + j  # actual time index (reverse sweep)
            x_arr = x_ref[j]  # (n_x, B)
            u_arr = u_ref[j]  # (n_u, B)
            mu_le_rows = [mu_le_ref[j, idx, :] for idx in range(n_hle)]
            mu_li_rows = [mu_li_ref[j, idx, :] for idx in range(n_hli)]

            (fx, fu, cx, cu, cxx, cuu, cxu, fxx, fuu, fxu,
             lower, upper, lo_hx, up_hx, lo_s, up_s, dok_step) = (
                step_derivative_components(
                    problem, safes, x_arr, u_arr, p, k, mu_le_rows,
                    mu_li_rows, wpl, full_ddp, np_dtype,
                )
            )
            dok_acc = dok_acc * dok_step
            u_k = [u_arr[a] for a in range(NU)]

            (l_k, L_k, dv0, dv1, Vx_new, Vxx_new, g_k,
             step_failed_f) = riccati_step(
                NX, NU, reg_type, full_ddp,
                fx, fu, cx, cu, cxx, cuu, cxu, fxx, fuu, fxu,
                lower, upper, lo_hx, up_hx, lo_s, up_s, u_k, lam,
                Vx, Vxx,
            )

            # live = 1 while no step has failed yet (freeze after failure)
            fail_acc = jnp.minimum(fail_acc + step_failed_f, 1.0)
            live = 1.0 - fail_acc

            for a in range(NU):
                l_ref[j, a, :] = live * l_k[a]
                for b in range(NX):
                    L_ref[j, a * NX + b, :] = live * L_k[a][b]

            Vx = [Vx[a] + live * (Vx_new[a] - Vx[a]) for a in range(NX)]
            Vxx = [[Vxx[a][b] + live * (Vxx_new[a][b] - Vxx[a][b])
                    for b in range(NX)] for a in range(NX)]
            dv_acc = [dv_acc[0] + live * dv0, dv_acc[1] + live * dv1]
            g_acc = g_acc + live * g_k

        for a in range(NX):
            vx_s[a, :] = Vx[a]
            for b in range(NX):
                vxx_s[XX(a, b), :] = Vxx[a][b]
        dv_s[0, :] = dv_acc[0]
        dv_s[1, :] = dv_acc[1]
        g_s[0, :] = g_acc
        fail_s[0, :] = fail_acc
        dok_s[0, :] = dok_acc

        @pl.when(i == (N // S) - 1)
        def _fin():
            dv_ref[...] = dv_s[...]
            gnorm_ref[0, :] = g_s[0, :] / float(N - 1)
            failed_ref[...] = fail_s[...]
            dok_ref[...] = dok_s[...]

    return kernel


def fused_derivs_back_pass(
    problem: Problem,
    xs: Array,  # (B, N+1, n_x) nominal trajectory
    us: Array,  # (B, N, n_u)
    mu_le: Array,  # (B, N, n_hle)
    mu_li: Array,
    mu_fe: Array,  # (B, n_hfe)
    mu_fi: Array,
    w_pen_l: Array,  # (B,) derivative-time penalty weights
    w_pen_f: Array,
    lam: Array,  # (B,)
    params: Any,  # shared pytree
    reg_type: int,
    full_ddp: bool,
    interpret: bool = False,
    time_block: int | None = None,
):
    """Batched fused pass.  Returns ``(BackPassResult, derivs_ok (B,) bool)``."""
    B, Np1, n_x = xs.shape
    N = Np1 - 1
    n_u = us.shape[-1]
    dtype = us.dtype
    np_dtype = np.dtype(dtype.name)

    pad = (-B) % 128
    if pad:
        padb = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], axis=0
        )
        xs, us, mu_le, mu_li, mu_fe, mu_fi, w_pen_l, w_pen_f, lam = (
            padb(a) for a in (xs, us, mu_le, mu_li, mu_fe, mu_fi,
                              w_pen_l, w_pen_f, lam)
        )
    Bp = B + pad

    to_cm = lambda a: jnp.transpose(a.reshape(Bp, N, -1), (1, 2, 0))
    x_cm = to_cm(xs[:, :N])
    u_cm = to_cm(us)
    mu_le_cm = to_cm(mu_le) if problem.n_hle else None
    mu_li_cm = to_cm(mu_li) if problem.n_hli else None
    xf_cm = jnp.transpose(xs[:, N], (1, 0))
    mu_fe_cm = jnp.transpose(mu_fe, (1, 0)) if problem.n_hfe else None
    mu_fi_cm = jnp.transpose(mu_fi, (1, 0)) if problem.n_hfi else None

    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaf_shapes = tuple(tuple(jnp.shape(x)) for x in leaves)
    norm_leaves = [_normalize_leaf(x).astype(dtype) for x in leaves]

    # Time-block the grid (see pallas_backpass).  The fused kernel's traced
    # body is large (in-kernel AD); cap the unroll below the generic VMEM
    # bound to keep Mosaic compile size in check.
    if time_block is not None:
        S = time_block
        if N % S:
            raise ValueError(f"time_block {S} must divide N={N}")
    elif interpret:
        S = 2 if N % 2 == 0 else 1
    else:
        from .pallas_backpass import _pick_time_block

        comps = n_x + n_u + problem.n_hle + problem.n_hli + n_u + n_u * n_x
        # Cap 4: the unrolled in-kernel AD temporaries live in scoped VMEM
        # alongside the DMA blocks; S=8 blew the 16M scoped limit by 1.2M
        # at B=2048 (v5e).
        S = min(_pick_time_block(N, comps, Bp, jnp.dtype(dtype).itemsize), 4)
        while N % S:
            S -= 1
    G = N // S

    kernel = _make_fused_kernel(
        problem, N, leaf_shapes, np_dtype, reg_type, full_ddp, treedef, S=S
    )

    def rev_spec(a):
        nd = a.ndim

        def idx(i):
            z = i - i
            return (G - 1 - i,) + (z,) * (nd - 1)

        return pl.BlockSpec((S,) + a.shape[1:], idx, memory_space=pltpu.VMEM)

    def whole(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i: (i - i,) * nd,
                            memory_space=pltpu.VMEM)

    step_inputs = [x_cm, u_cm]
    if problem.n_hle:
        step_inputs.append(mu_le_cm)
    if problem.n_hli:
        step_inputs.append(mu_li_cm)
    fixed_inputs = [xf_cm, w_pen_l[None, :], w_pen_f[None, :], lam[None, :]]
    if problem.n_hfe:
        fixed_inputs.append(mu_fe_cm)
    if problem.n_hfi:
        fixed_inputs.append(mu_fi_cm)
    fixed_inputs += norm_leaves

    in_specs = [rev_spec(a) for a in step_inputs]
    in_specs += [whole(a) for a in fixed_inputs]

    rev2 = lambda i: (G - 1 - i, i - i, i - i)
    fix2 = lambda i: (i - i, i - i)
    out_shape = [
        jax.ShapeDtypeStruct((N, n_u, Bp), dtype),  # l
        jax.ShapeDtypeStruct((N, n_u * n_x, Bp), dtype),  # L (row-major u,x)
        jax.ShapeDtypeStruct((2, Bp), dtype),  # dV
        jax.ShapeDtypeStruct((1, Bp), dtype),  # g_norm
        jax.ShapeDtypeStruct((1, Bp), dtype),  # failed (0/1)
        jax.ShapeDtypeStruct((1, Bp), dtype),  # derivs ok (0/1)
    ]
    out_specs = [
        pl.BlockSpec((S, n_u, Bp), rev2, memory_space=pltpu.VMEM),
        pl.BlockSpec((S, n_u * n_x, Bp), rev2, memory_space=pltpu.VMEM),
        pl.BlockSpec((2, Bp), fix2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bp), fix2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bp), fix2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bp), fix2, memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((n_x, Bp), dtype),
        pltpu.VMEM((n_x * n_x, Bp), dtype),
        pltpu.VMEM((2, Bp), dtype),
        pltpu.VMEM((1, Bp), dtype),
        pltpu.VMEM((1, Bp), dtype),
        pltpu.VMEM((1, Bp), dtype),
    ]
    l_cm, L_cm, dV, g_norm, failed, dok = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*step_inputs, *fixed_inputs)

    res = BackPassResult(
        l=jnp.transpose(l_cm, (2, 0, 1)),
        L=jnp.transpose(L_cm, (2, 0, 1)).reshape(Bp, N, n_u, n_x),
        dV=jnp.transpose(dV, (1, 0)),
        g_norm=g_norm[0],
        failed=failed[0] > 0.0,
    )
    dok_b = dok[0] > 0.5
    if pad:
        res = jax.tree_util.tree_map(lambda a: a[:B], res)
        dok_b = dok_b[:B]
    return res, dok_b
