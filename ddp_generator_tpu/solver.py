"""The outer iLQG loop -- TPU-native re-derivation of ``iLQG.c:224-379``.

The whole solve is ONE jittable function built by :func:`make_solver`, with
every data-dependent branch of the reference (Levenberg-Marquardt lambda
escalation, accept/reject, penalty re-rollouts, early exits) expressed as
masked state updates inside a ``lax.while_loop``.  That makes the solver
``vmap``-able over problem instances: per-instance divergence of those
branches is exactly per-lane masking (SURVEY.md section 7 "hard parts").

Per iteration (cf. the STEP comments in ``iLQG.c:239-361``):

1. derivatives along the nominal trajectory when ``newDeriv`` (iLQG.c:241-256)
   -- rejected steps keep the reference's *stale* derivatives bit-exactly by
   recomputing the bundle from its (unchanged) inputs each iteration instead
   of carrying it in the loop state (see ``_Carry.w_pen_l_d``);
2. backward pass with lambda escalation on failure (iLQG.c:261-284);
3. gradient-tolerance exit (iLQG.c:297-303);
4. multi-alpha line search (iLQG.c:307, line_search.c);
5. accept: lambda decrease, trajectory swap, tolFun exit, multiplier update +
   penalty re-rollout (iLQG.c:312-339); reject: lambda increase, optional
   w_pen_fact2 penalty bump + re-rollout, lambdaMax exit (iLQG.c:340-361).

Two drivers share the same iteration body:

* :func:`make_solver` -- the whole loop on-device (``lax.while_loop``).
  Right for CPU and for short ``max_iter`` budgets.
* :func:`make_stepwise_solver` -- a host loop dispatching bounded *chunks*
  of iterations per device call.  Some TPU runtimes kill device programs
  that run for minutes (watchdog "worker crashed"); chunking bounds each
  program's duration while keeping bit-identical semantics (the loop carry
  round-trips through device memory, not the host).  This also mirrors the
  reference's actual architecture: outer loop on the host (``iLQG.c``),
  heavy passes as kernels.

Console tracing: the reference prints per-iteration status at
``debug_level >= 1`` via the injected ``PRNT`` (iLQG.c:313-314,352-353).  In a
jitted TPU solver host-side printing serializes execution, so in-device
tracing is only emitted (via ``jax.debug.print``) at ``debug_level >= 3``;
levels 1-2 keep the reference's default numeric behavior with no extra host
round-trips.  :class:`StepwiseSolver` restores reference-grade observability
for free: its host loop already syncs one scalar per chunk, so at
``debug_level >= 1`` it prints a per-chunk status line (active lanes, mean
cost, lambda range, elapsed wall time) on stderr.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import solution as sol
from .al import Multipliers, init_multipliers, update_multipliers
from .derivs import calc_derivs
from .options import SolverOptions
from .ops.backpass import back_pass
from .ops.boxqp import BoxQPHyper
from .ops.forward import cost_only, forward_pass
from .ops.linesearch import line_search
from .problem import Problem
from .solution import Solution
from .utils.tree import tree_where

Array = jax.Array


class _Carry(NamedTuple):
    xs: Array  # (N+1, n_x); xs[0] is always the initial state x0
    us: Array
    cost: Array
    mult: Multipliers
    lam: Array
    dlam: Array
    w_pen_l: Array
    w_pen_f: Array
    # Penalty weights the derivative bundle must be evaluated with: frozen at
    # the last accept, so reject-path w_pen bumps (w_pen_fact2) keep using
    # STALE derivatives exactly like the reference (iLQG.c:241-256 only
    # recomputes when newDeriv).  The bundle itself is NOT carried: it is a
    # pure function of (xs, us, mult, w_pen_*_d), all of which are unchanged
    # on reject/retry iterations, so recomputing it each iteration is
    # bit-identical to storing it -- and drops ~180 floats/step of loop-carry
    # state (the select + carry traffic cost more than calc_derivs itself;
    # measured in scripts/profile_parts.py).
    w_pen_l_d: Array
    w_pen_f_d: Array
    new_deriv: Array  # bool
    back_pass_done: Array  # bool (final-success determination, iLQG.c:367)
    it: Array  # int32
    done: Array  # bool
    status: Array  # int32
    g_norm: Array
    dcost: Array
    expected: Array
    z: Array
    log_linesearch: Array
    log_z: Array
    log_cost: Array
    body_calls: Array  # int32 (see Solution.body_calls)
    stale_calls: Array  # int32
    bp_retry_calls: Array  # int32 (see Solution.bp_retry_calls)
    was_bp_retry: Array  # bool: previous call ended in a lambda retry


def _boxqp_hyper(o: SolverOptions) -> BoxQPHyper:
    # "auto" resolves the boxQP tolerances per dtype: the reference values
    # (boxQP.c:52-57) are calibrated for double precision; in float32 a
    # warm-started-at-the-optimum QP cannot drive its gradient below
    # ~eps*|g| ~ 1e-8, so the 1e-8 minGrad would be unreachable and the
    # residual search direction is rounding noise, tripping the non-descent
    # failure (res=-2) and a spurious lambda escalation.  Explicit user
    # floats are always used verbatim (see options.py).
    f32 = jnp.dtype(o.dtype) == jnp.float32
    min_grad = o.boxqp_min_grad
    if min_grad == "auto":
        min_grad = 1e-5 if f32 else 1e-8
    min_rel_improve = o.boxqp_min_rel_improve
    if min_rel_improve == "auto":
        min_rel_improve = 1e-6 if f32 else 1e-8
    return BoxQPHyper(
        max_iter=o.boxqp_max_iter,
        min_grad=min_grad,
        min_rel_improve=min_rel_improve,
        step_dec=o.boxqp_step_dec,
        min_step=o.boxqp_min_step,
        armijo=o.boxqp_armijo,
        method=o.boxqp_method,
        use_mod_chol=o.use_mod_chol,
    )


def _mask_where(mask, a, b):
    """Pytree select with a lane mask broadcast across trailing axes (works
    for scalar per-lane masks under vmap and (B,) masks in batched rules)."""
    def w(x, y):
        m = mask
        extra = jnp.ndim(x) - jnp.ndim(m)
        if extra > 0:
            m = m.reshape(jnp.shape(m) + (1,) * extra)
        return jnp.where(m, x, y)

    return jax.tree_util.tree_map(w, a, b)


def _lam_retry_loop(bp_call, bp0, lam0, dlam0, can, o: SolverOptions):
    """The reference's inner lambda-escalation while (``iLQG.c:261-284``):
    a failed backward pass escalates lambda and re-runs ONLY the backward
    pass; derivatives stay frozen (``bp_call`` must close over the bundle).

    Works per-lane (scalar carry, under vmap) and batch-wide ((B,) carry in
    a custom_vmap rule; one extra kernel execution per max-over-lanes
    retry).  Per-lane (lambda, attempt) sequences are exactly those of the
    deferred path (``lam_retry="deferred"``), which re-enters the outer
    body per retry.

    Returns ``(bp, lam, dlam, n_attempts)``; lanes that exhaust the
    schedule keep ``bp.failed`` with lambda escalated past ``lambdaMax``
    (the caller maps that to STATUS_NO_DESCENT, ``iLQG.c:367-371``).
    """
    i32 = jnp.int32

    def cond(s):
        return jnp.any(s[3])

    def body(s):
        lam, dlam, bp, cont, n = s
        dlam_f = jnp.maximum(dlam * o.lambdaFactor, o.lambdaFactor)
        lam_f = jnp.maximum(lam * dlam_f, o.lambdaMin)
        over = lam_f > o.lambdaMax
        do = cont & ~over
        bp1 = bp_call(lam_f)
        bp = _mask_where(do, bp1, bp)
        lam = jnp.where(cont, lam_f, lam)
        dlam = jnp.where(cont, dlam_f, dlam)
        return lam, dlam, bp, do & bp1.failed, n + do.astype(i32)

    cont0 = bp0.failed & can
    lam, dlam, bp, _, n = lax.while_loop(
        cond, body,
        (lam0, dlam0, bp0, cont0, jnp.zeros(jnp.shape(cont0), i32)),
    )
    return bp, lam, dlam, n


def _make_parts(problem: Problem, options: SolverOptions):
    """Build (init_fn, body_fn, finalize_fn) sharing one iteration body.

    * ``init_fn(x0, u0, params) -> _Carry``: initial rollout + multiplier
      recording (``iLQG_mex.c:113-116``, ``iLQG.c:237``).
    * ``body_fn(carry, params) -> _Carry``: ONE outer iLQG iteration
      (masked; a finished carry passes through unchanged).
    * ``finalize_fn(carry) -> Solution``.
    """
    o = options
    dtype = jnp.dtype(o.dtype)
    hyper = _boxqp_hyper(o)
    lambda_success_thresh = 1e-5  # iLQG.c:297

    def _cast_param(leaf):
        a = jnp.asarray(leaf)
        return a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a

    def cast_params(params):
        # Cast all floating params to the solve dtype so a float64 params
        # pytree can't leak float64 into a float32 solve (and vice versa).
        return jax.tree_util.tree_map(_cast_param, params)

    _inline_retry = o.lam_retry == "inline"

    def _no_att(like):
        return jnp.zeros(jnp.shape(like), jnp.int32)

    if o.backpass_method == "pallas":
        from jax import custom_batching

        from .ops.cm_derivs import cm_back_pass_from_bundle, cm_emit
        from .ops.pallas_backpass import batched_back_pass_pallas

        if problem.n_u > 3:
            raise ValueError("backpass_method='pallas' supports n_u <= 3")
        # Interpret the kernel off-TPU so the pallas path is testable on CPU.
        _interp = jax.default_backend() != "tpu"

        def _serial_derivs_bp_p(xs, us, mult, wld, wfd, lam, dlam,
                                new_deriv, live, params):
            d = calc_derivs(
                problem, xs, us, params,
                mult.mu_le, mult.mu_li, mult.mu_fe, mult.mu_fi,
                wld, wfd, o.full_ddp,
            )
            bpc = lambda lm: back_pass(d, us, lm, o.regType, o.full_ddp,
                                       hyper, unroll=o.scan_unroll)
            bp = bpc(lam)
            if _inline_retry:
                can = live & ~(new_deriv & ~d.ok)
                bp, lam, dlam, n_att = _lam_retry_loop(
                    bpc, bp, lam, dlam, can, o)
            else:
                n_att = _no_att(live)
            return bp, d.ok, lam, dlam, n_att

        @custom_batching.custom_vmap
        def _run_derivs_bp(xs, us, mult, wld, wfd, lam, dlam,
                           new_deriv, live, params):
            # Unbatched (per-instance) calls keep the XLA path.
            return _serial_derivs_bp_p(xs, us, mult, wld, wfd, lam, dlam,
                                       new_deriv, live, params)

        @_run_derivs_bp.def_vmap
        def _cm_vmap_rule(axis_size, in_batched, *operands):
            (xs, us, mult, wld, wfd, lam, dlam, new_deriv, live,
             params_op) = operands
            (xs_b, us_b, mult_b, wld_b, wfd_b, lam_b, dlam_b, nd_b,
             live_b, params_b) = in_batched

            # custom_vmap passes operands that were constant across lanes
            # unbatched; broadcast them so the kernel sees uniform (B, ...)
            def bc(x, b):
                return x if b else jnp.broadcast_to(
                    jnp.asarray(x)[None], (axis_size,) + jnp.shape(x)
                )

            xs, us, wld, wfd, lam, dlam, new_deriv, live = (
                bc(xs, xs_b), bc(us, us_b), bc(wld, wld_b),
                bc(wfd, wfd_b), bc(lam, lam_b), bc(dlam, dlam_b),
                bc(new_deriv, nd_b), bc(live, live_b),
            )
            mult = jax.tree_util.tree_map(bc, mult, mult_b)
            if any(jax.tree_util.tree_leaves(params_b)):
                # Per-lane params: the CM emission closes over one shared
                # params pytree, so fall back to the batch-major autodiff
                # bundle + the transposing kernel adapter.
                params_bc = jax.tree_util.tree_map(bc, params_op, params_b)
                d = jax.vmap(
                    lambda xs_, us_, m_, wl_, wf_, p_: calc_derivs(
                        problem, xs_, us_, p_,
                        m_.mu_le, m_.mu_li, m_.mu_fe, m_.mu_fi,
                        wl_, wf_, o.full_ddp,
                    )
                )(xs, us, mult, wld, wfd, params_bc)
                d_ok = d.ok
                bpc = lambda lm: batched_back_pass_pallas(
                    d, us, lm, o.regType, o.full_ddp, interpret=_interp
                )
            else:
                # Emission ONCE; lambda retries below re-run only the
                # kernel on the frozen bundle (iLQG.c:241-256 newDeriv).
                sd_cm, fcx, fcxx, us_cm, d_ok, pad = cm_emit(
                    problem, xs, us, mult.mu_le, mult.mu_li,
                    mult.mu_fe, mult.mu_fi, wld, wfd, params_op,
                    o.full_ddp,
                    shared_primal=o.derivs_emitter == "shared",
                )
                bpc = lambda lm: cm_back_pass_from_bundle(
                    sd_cm, fcx, fcxx, us_cm, lm, problem.n_x,
                    o.regType, o.full_ddp, pad, interpret=_interp,
                )
            bp = bpc(lam)
            if _inline_retry:
                can = live & ~(new_deriv & ~d_ok)
                bp, lam, dlam, n_att = _lam_retry_loop(
                    bpc, bp, lam, dlam, can, o)
            else:
                n_att = _no_att(live)
            out = (bp, d_ok, lam, dlam, n_att)
            out_batched = jax.tree_util.tree_map(lambda _: True, out)
            return out, out_batched

        _run_back_pass = None  # unused on the combined path

    elif o.backpass_method == "fused":
        from jax import custom_batching

        from .ops.pallas_fused import fused_derivs_back_pass

        if problem.n_u > 3:
            raise ValueError("backpass_method='fused' supports n_u <= 3")
        _interp = jax.default_backend() != "tpu"

        def _serial_derivs_bp(xs, us, mult, wld, wfd, lam, dlam,
                              new_deriv, live, params):
            d = calc_derivs(
                problem, xs, us, params,
                mult.mu_le, mult.mu_li, mult.mu_fe, mult.mu_fi,
                wld, wfd, o.full_ddp,
            )
            bpc = lambda lm: back_pass(d, us, lm, o.regType, o.full_ddp,
                                       hyper, unroll=o.scan_unroll)
            bp = bpc(lam)
            if _inline_retry:
                can = live & ~(new_deriv & ~d.ok)
                bp, lam, dlam, n_att = _lam_retry_loop(
                    bpc, bp, lam, dlam, can, o)
            else:
                n_att = _no_att(live)
            return bp, d.ok, lam, dlam, n_att

        @custom_batching.custom_vmap
        def _run_derivs_bp(xs, us, mult, wld, wfd, lam, dlam,
                           new_deriv, live, params):
            # Unbatched (per-instance) calls keep the XLA path.
            return _serial_derivs_bp(xs, us, mult, wld, wfd, lam, dlam,
                                     new_deriv, live, params)

        @_run_derivs_bp.def_vmap
        def _fused_vmap_rule(axis_size, in_batched, *operands):
            (xs, us, mult, wld, wfd, lam, dlam, new_deriv, live,
             params_op) = operands
            (xs_b, us_b, mult_b, wld_b, wfd_b, lam_b, dlam_b, nd_b,
             live_b, params_b) = in_batched

            def bc(x, b):
                return x if b else jnp.broadcast_to(
                    jnp.asarray(x)[None], (axis_size,) + jnp.shape(x)
                )

            xs, us, wld, wfd, lam, dlam, new_deriv, live = (
                bc(xs, xs_b), bc(us, us_b), bc(wld, wld_b),
                bc(wfd, wfd_b), bc(lam, lam_b), bc(dlam, dlam_b),
                bc(new_deriv, nd_b), bc(live, live_b),
            )
            mult = jax.tree_util.tree_map(bc, mult, mult_b)
            if any(jax.tree_util.tree_leaves(params_b)):
                params_bc = jax.tree_util.tree_map(bc, params_op, params_b)
                out = jax.vmap(_serial_derivs_bp)(
                    xs, us, mult, wld, wfd, lam, dlam, new_deriv, live,
                    params_bc
                )
            else:
                # The fused kernel re-derives the bundle in-VMEM per
                # attempt (that is its design: the bundle never exists in
                # memory), so a retry costs one full kernel execution --
                # values are identical, inputs being unchanged.
                bpc = lambda lm: fused_derivs_back_pass(
                    problem, xs, us, mult.mu_le, mult.mu_li,
                    mult.mu_fe, mult.mu_fi, wld, wfd, lm, params_op,
                    o.regType, o.full_ddp, interpret=_interp,
                )
                bp, d_ok = bpc(lam)
                if _inline_retry:
                    can = live & ~(new_deriv & ~d_ok)
                    bp, lam, dlam, n_att = _lam_retry_loop(
                        lambda lm: bpc(lm)[0], bp, lam, dlam, can, o)
                else:
                    n_att = _no_att(live)
                out = (bp, d_ok, lam, dlam, n_att)
            out_batched = jax.tree_util.tree_map(lambda _: True, out)
            return out, out_batched

        _run_back_pass = None  # unused on the fused path

    elif o.backpass_method == "parallel":
        from .ops.parallel_riccati import parallel_back_pass

        if problem.n_h > 0:
            raise ValueError(
                "backpass_method='parallel' requires an unconstrained "
                "problem (no h constraints): boxQP clamping is a per-step "
                "nonlinearity that breaks the associative-scan formulation"
            )
        if o.full_ddp:
            raise ValueError(
                "backpass_method='parallel' requires full_ddp=False (the "
                "FULL_DDP tensor terms couple the stage cost to the "
                "downstream Vx)"
            )

        def _run_back_pass(derivs, us, lam, hyper):
            return parallel_back_pass(derivs, us, lam, o.regType, hyper)

    else:

        def _run_back_pass(derivs, us, lam, hyper):
            return back_pass(derivs, us, lam, o.regType, o.full_ddp, hyper,
                             unroll=o.scan_unroll)

    def _serial_line_search(x0, xs, us, l, L, dV, cost,
                            mle, mli, mfe, mfi, wl, wf, params):
        return line_search(
            problem, jnp.asarray(o.alpha, dtype), x0, xs, us, l, L, dV,
            cost, o.zMin, params, mle, mli, mfe, mfi, wl, wf,
            unroll=o.scan_unroll,
        )

    if o.linesearch_method == "pallas":
        from jax import custom_batching

        from .ops.pallas_rollout import (
            pallas_line_search,
            pallas_line_search_staged,
        )

        _ls_interp = jax.default_backend() != "tpu"
        _alphas_static = tuple(float(a) for a in o.alpha)

        @custom_batching.custom_vmap
        def _run_line_search(x0, xs, us, l, L, dV, cost,
                             mle, mli, mfe, mfi, wl, wf, alive, params):
            # Unbatched (per-instance) calls keep the serial XLA path.
            return _serial_line_search(x0, xs, us, l, L, dV, cost,
                                       mle, mli, mfe, mfi, wl, wf, params)

        @_run_line_search.def_vmap
        def _ls_vmap_rule(axis_size, in_batched, *operands):
            *arrs, alive_op, params_op = operands
            *arrs_b, alive_b, params_b = in_batched

            def bc(x, b):
                return x if b else jnp.broadcast_to(
                    jnp.asarray(x)[None], (axis_size,) + jnp.shape(x)
                )

            arrs = [bc(a, b) for a, b in zip(arrs, arrs_b)]
            alive = bc(alive_op, alive_b)
            if any(jax.tree_util.tree_leaves(params_b)):
                # Per-lane params: fall back to the vmapped XLA path (the
                # kernel closes over a single shared params pytree).
                params_bc = jax.tree_util.tree_map(bc, params_op, params_b)
                out = jax.vmap(_serial_line_search)(*arrs, params_bc)
            else:
                (x0, xs, us, l, L, dV, cost,
                 mle, mli, mfe, mfi, wl, wf) = arrs
                if o.linesearch_staged:
                    out = pallas_line_search_staged(
                        problem, _alphas_static, x0, xs, us, l, L, dV,
                        cost, o.zMin, params_op, mle, mli, mfe, mfi,
                        wl, wf, alive=alive, interpret=_ls_interp,
                    )
                else:
                    out = pallas_line_search(
                        problem, _alphas_static, x0, xs, us, l, L, dV,
                        cost, o.zMin, params_op, mle, mli, mfe, mfi,
                        wl, wf, interpret=_ls_interp,
                    )
            out_batched = jax.tree_util.tree_map(lambda _: True, out)
            return out, out_batched

    else:

        def _run_line_search(x0, xs, us, l, L, dV, cost,
                             mle, mli, mfe, mfi, wl, wf, alive, params):
            return _serial_line_search(x0, xs, us, l, L, dV, cost,
                                       mle, mli, mfe, mfi, wl, wf, params)

    def init_fn(x0: Array, u0: Array, params: Any) -> _Carry:
        x0 = jnp.asarray(x0, dtype)
        u0 = jnp.asarray(u0, dtype)
        params = cast_params(params)
        N = u0.shape[0]
        w_pen_max_l = jnp.asarray(o.w_pen_max_l, dtype)
        w_pen_max_f = jnp.asarray(o.w_pen_max_f, dtype)

        mult0 = init_multipliers(problem, N, dtype)
        w_pen_l0 = jnp.asarray(o.w_pen_init_l, dtype)
        w_pen_f0 = jnp.asarray(o.w_pen_init_f, dtype)

        # Initial open-loop rollout (iLQG_mex.c:113-116): alpha=0, u = u0.
        zeros_l = jnp.zeros((N, problem.n_u), dtype)
        zeros_L = jnp.zeros((N, problem.n_u, problem.n_x), dtype)
        xs_dummy = jnp.zeros((N + 1, problem.n_x), dtype)
        r0 = forward_pass(
            problem, x0, xs_dummy, u0, zeros_l, zeros_L,
            jnp.zeros((), dtype), params,
            mult0.mu_le, mult0.mu_li, mult0.mu_fe, mult0.mu_fi,
            w_pen_l0, w_pen_f0, unroll=o.scan_unroll,
        )

        # update_multipliers(o, 1): record last_h along the initial
        # trajectory (iLQG.c:237).
        mu0 = update_multipliers(
            problem, r0.xs, r0.us, params, mult0,
            w_pen_l0, w_pen_f0, w_pen_max_l, w_pen_max_f,
            o.w_pen_fact1, o.tolConstraint, init=True,
        )

        init_failed = ~r0.ok
        # xs[0] must be x0 even when the rollout NaN'd out mid-way (the
        # body reads x0 back from xs[0]).
        xs0 = r0.xs.at[0].set(x0)
        return _Carry(
            xs=xs0,
            us=r0.us,
            cost=r0.cost,
            mult=mu0.multipliers,
            lam=jnp.asarray(o.lambdaInit, dtype),
            dlam=jnp.asarray(o.dlambdaInit, dtype),
            w_pen_l=w_pen_l0,
            w_pen_f=w_pen_f0,
            w_pen_l_d=w_pen_l0,
            w_pen_f_d=w_pen_f0,
            new_deriv=jnp.asarray(True),
            back_pass_done=jnp.asarray(False),
            it=jnp.asarray(0, jnp.int32),
            done=init_failed,
            status=jnp.where(
                init_failed,
                jnp.asarray(sol.STATUS_INIT_FAILED, jnp.int32),
                jnp.asarray(sol.STATUS_RUNNING, jnp.int32),
            ),
            g_norm=jnp.zeros((), dtype),
            dcost=jnp.zeros((), dtype),
            expected=jnp.zeros((), dtype),
            z=jnp.zeros((), dtype),
            log_linesearch=jnp.zeros((max(o.max_iter, 1),), jnp.int32),
            log_z=jnp.zeros((max(o.max_iter, 1),), dtype),
            log_cost=jnp.zeros((max(o.max_iter, 1),), dtype),
            body_calls=jnp.asarray(0, jnp.int32),
            stale_calls=jnp.asarray(0, jnp.int32),
            bp_retry_calls=jnp.asarray(0, jnp.int32),
            was_bp_retry=jnp.asarray(False),
        )

    def body_fn(c: _Carry, params: Any) -> _Carry:
        params = cast_params(params)
        w_pen_max_l = jnp.asarray(o.w_pen_max_l, dtype)
        w_pen_max_f = jnp.asarray(o.w_pen_max_f, dtype)
        x0 = c.xs[0]
        status = c.status
        # Per-lane instrumentation: a done lane passing through a (vmapped)
        # body call is not a processed iteration.
        processed = (~c.done).astype(jnp.int32)
        body_calls = c.body_calls + processed
        stale_calls = c.stale_calls + processed * (~c.new_deriv).astype(jnp.int32)

        # ===== STEP 1: derivatives (iLQG.c:241-256) =====
        # Recomputed every call from inputs that only change when new_deriv
        # is set (see _Carry.w_pen_l_d): reject/λ-retry iterations reproduce
        # the exact stored bundle of the reference's stale-derivative path.
        w_pen_l_d = jnp.where(c.new_deriv, c.w_pen_l, c.w_pen_l_d)
        w_pen_f_d = jnp.where(c.new_deriv, c.w_pen_f, c.w_pen_f_d)
        # ===== STEP 2: backward pass + lambda escalation =====
        # (iLQG.c:261-284).  lam_retry="inline": the reference's inner
        # retry while runs HERE (around only the backward pass, frozen
        # bundle) -- a retry costs one backward-pass execution.
        # lam_retry="deferred": ONE attempt per body call; a failed pass
        # escalates lambda and the lane retries on the next call WITHOUT
        # advancing its iteration counter (same per-lane attempt sequence,
        # but each retry re-pays derivative emission + masked line-search
        # compute).
        live = (~c.done) & (c.it < o.max_iter)
        if o.backpass_method in ("pallas", "fused"):
            bp, d_ok, lam_r, dlam_r, n_att = _run_derivs_bp(
                c.xs, c.us, c.mult, w_pen_l_d, w_pen_f_d, c.lam, c.dlam,
                c.new_deriv, live, params
            )
        else:
            derivs = calc_derivs(
                problem, c.xs, c.us, params,
                c.mult.mu_le, c.mult.mu_li, c.mult.mu_fe, c.mult.mu_fi,
                w_pen_l_d, w_pen_f_d, o.full_ddp,
            )
            d_ok = derivs.ok
            bp = _run_back_pass(derivs, c.us, c.lam, hyper)
            if _inline_retry:
                can = live & ~(c.new_deriv & ~d_ok)
                bp, lam_r, dlam_r, n_att = _lam_retry_loop(
                    lambda lm: _run_back_pass(derivs, c.us, lm, hyper),
                    bp, c.lam, c.dlam, can, o,
                )
            else:
                lam_r, dlam_r = c.lam, c.dlam
                n_att = jnp.zeros((), jnp.int32)
        derivs_failed = c.new_deriv & ~d_ok
        status = jnp.where(
            derivs_failed, jnp.asarray(sol.STATUS_DERIVS_FAILED, jnp.int32),
            status,
        )
        alive = ~derivs_failed
        new_deriv = jnp.asarray(False)
        if _inline_retry:
            # The inner while exhausted the schedule: any still-failed lane
            # has lambda escalated past lambdaMax => NO_DESCENT.  The extra
            # `live` mask is defensive: a retired lane (done / out of
            # budget) must never have its status overwritten -- the vmapped
            # while_loop batching rule happens to freeze such lanes'
            # carries, but the masked-update convention must not lean on
            # that non-local invariant (semantics unchanged: lanes leaving
            # _lam_retry_loop still failed are guaranteed lam > lambdaMax).
            lam, dlam = lam_r, dlam_r
            bp_failed = alive & bp.failed
            gave_up = bp_failed & live
            retrying = jnp.zeros_like(bp_failed)
            bp_retry_calls = c.bp_retry_calls + n_att
        else:
            dlam_f = jnp.maximum(c.dlam * o.lambdaFactor, o.lambdaFactor)
            lam_f = jnp.maximum(c.lam * dlam_f, o.lambdaMin)
            bp_failed = alive & bp.failed
            gave_up = bp_failed & (lam_f > o.lambdaMax)
            retrying = bp_failed & ~gave_up
            lam = jnp.where(bp_failed, lam_f, c.lam)
            dlam = jnp.where(bp_failed, dlam_f, c.dlam)
            bp_retry_calls = c.bp_retry_calls + processed * (
                c.was_bp_retry & ~c.new_deriv
            ).astype(jnp.int32)
        status = jnp.where(
            gave_up, jnp.asarray(sol.STATUS_NO_DESCENT, jnp.int32), status
        )
        alive = alive & ~bp_failed
        back_pass_done = jnp.where(alive, jnp.asarray(True), c.back_pass_done)
        g_norm = jnp.where(alive, bp.g_norm, c.g_norm)

        # ===== gradient-tolerance exit (iLQG.c:297-303) =====
        grad_exit = alive & (g_norm < o.tolGrad) & (lam < lambda_success_thresh)
        dlam_g = jnp.minimum(dlam / o.lambdaFactor, 1.0 / o.lambdaFactor)
        lam_g = lam * dlam_g * (lam > o.lambdaMin).astype(dtype)
        dlam = jnp.where(grad_exit, dlam_g, dlam)
        lam = jnp.where(grad_exit, lam_g, lam)
        status = jnp.where(
            grad_exit, jnp.asarray(sol.STATUS_SUCCESS_GRADIENT, jnp.int32),
            status,
        )
        alive = alive & ~grad_exit

        # ===== STEP 3: line search (iLQG.c:305-309) =====
        # ls_alive additionally masks lanes the while/chunk predicate has
        # retired (done or out of budget): the staged pallas search uses it
        # to decide whether any lane actually needs the full alpha sweep.
        ls_alive = alive & ~c.done & (c.it < o.max_iter)
        ls = _run_line_search(
            x0, c.xs, c.us, bp.l, bp.L, bp.dV, c.cost,
            c.mult.mu_le, c.mult.mu_li, c.mult.mu_fe, c.mult.mu_fi,
            c.w_pen_l, c.w_pen_f, ls_alive, params,
        )
        log_linesearch = jnp.where(
            alive,
            c.log_linesearch.at[c.it].set(
                jnp.minimum(ls.alpha_index + 1, len(o.alpha)).astype(jnp.int32)
            ),
            c.log_linesearch,
        )
        log_z = jnp.where(alive, c.log_z.at[c.it].set(ls.z), c.log_z)
        log_cost = jnp.where(
            alive, c.log_cost.at[c.it].set(ls.new_cost), c.log_cost
        )

        accepted = alive & ls.success
        rejected = alive & ~ls.success

        # ===== STEP 4a: accept (iLQG.c:312-339) =====
        dlam_a = jnp.minimum(dlam / o.lambdaFactor, 1.0 / o.lambdaFactor)
        lam_a = lam * dlam_a * (lam > o.lambdaMin).astype(dtype)
        xs = tree_where(accepted, ls.xs, c.xs)
        us = tree_where(accepted, ls.us, c.us)
        cost = jnp.where(accepted, ls.new_cost, c.cost)
        new_deriv = new_deriv | accepted

        tolfun_exit = accepted & (ls.dcost < o.tolFun)
        status = jnp.where(
            tolfun_exit, jnp.asarray(sol.STATUS_SUCCESS_TOLFUN, jnp.int32),
            status,
        )
        do_mult_update = accepted & ~tolfun_exit

        # With no AL constraint families the multiplier update is the empty
        # update and the penalty re-rollout re-evaluates an unchanged
        # objective (penalty terms don't exist), so both are statically
        # elided -- reference behavior is unchanged, just not re-derived
        # (iLQG.c:337-338,345-348 are no-ops for such problems).
        has_al = (problem.n_hle + problem.n_hli
                  + problem.n_hfe + problem.n_hfi) > 0

        if has_al:
            upd = update_multipliers(
                problem, xs, us, params, c.mult,
                c.w_pen_l, c.w_pen_f, w_pen_max_l, w_pen_max_f,
                o.w_pen_fact1, o.tolConstraint, init=False,
            )
            mult = tree_where(do_mult_update, upd.multipliers, c.mult)
            w_pen_l = jnp.where(do_mult_update, upd.w_pen_l, c.w_pen_l)
            w_pen_f = jnp.where(do_mult_update, upd.w_pen_f, c.w_pen_f)
        else:
            mult = c.mult
            w_pen_l, w_pen_f = c.w_pen_l, c.w_pen_f

        # ===== STEP 4b: reject (iLQG.c:340-361) =====
        dlam_r = jnp.maximum(dlam * o.lambdaFactor, o.lambdaFactor)
        lam_r = jnp.maximum(lam * dlam_r, o.lambdaMin)
        dlam = jnp.where(accepted, dlam_a, jnp.where(rejected, dlam_r, dlam))
        lam = jnp.where(accepted, lam_a, jnp.where(rejected, lam_r, lam))

        if o.w_pen_fact2 > 1.0:
            bump = rejected
            w_pen_l = jnp.where(
                bump, jnp.minimum(w_pen_max_l, w_pen_l * o.w_pen_fact2), w_pen_l
            )
            w_pen_f = jnp.where(
                bump, jnp.minimum(w_pen_max_f, w_pen_f * o.w_pen_fact2), w_pen_f
            )
            recost = do_mult_update | bump
        else:
            recost = do_mult_update

        if has_al:
            # Penalty re-rollout: forward_pass(nominal, o, 0.0, &cost, 1)
            # (iLQG.c:338,348) -- cost of the unchanged trajectory under the
            # new multipliers / penalty weights.
            new_cost_eval = cost_only(
                problem, xs, us, params,
                mult.mu_le, mult.mu_li, mult.mu_fe, mult.mu_fi,
                w_pen_l, w_pen_f,
            )
            cost = jnp.where(recost, new_cost_eval, cost)

        lammax_exit = rejected & (lam > o.lambdaMax)
        status = jnp.where(
            lammax_exit, jnp.asarray(sol.STATUS_EXIT_LAMBDA_MAX, jnp.int32),
            status,
        )

        done = status != sol.STATUS_RUNNING
        halt = done | retrying
        if o.debug_level >= 3:
            jax.debug.print(
                "iter: {i}  accepted: {a}  cost: {c:.6g}  reduction: {d:.3g}"
                "  gradient: {g:.3g}  z: {z:.3g}  log10(lam): {l:.1f}"
                "  w_pen_l: {wl:.3g} w_pen_f: {wf:.3g}",
                i=c.it + 1, a=accepted, c=cost, d=ls.dcost, g=g_norm,
                z=ls.z, l=jnp.log10(jnp.maximum(lam, 1e-300)),
                wl=w_pen_l, wf=w_pen_f,
            )

        return _Carry(
            xs=xs,
            us=us,
            cost=cost,
            mult=mult,
            lam=lam,
            dlam=dlam,
            w_pen_l=w_pen_l,
            w_pen_f=w_pen_f,
            w_pen_l_d=w_pen_l_d,
            w_pen_f_d=w_pen_f_d,
            new_deriv=new_deriv,
            back_pass_done=back_pass_done,
            # C breaks before the for-increment, so o->iterations keeps
            # the breaking iteration's index (iLQG.c:365); a lambda-retry
            # does not consume an iteration (it re-enters the reference's
            # inner while, iLQG.c:261).
            it=jnp.where(halt, c.it, c.it + 1),
            done=done,
            status=status,
            g_norm=g_norm,
            dcost=jnp.where(alive, ls.dcost, c.dcost),
            expected=jnp.where(alive, ls.expected, c.expected),
            z=jnp.where(alive, ls.z, c.z),
            log_linesearch=log_linesearch,
            log_z=log_z,
            log_cost=log_cost,
            body_calls=body_calls,
            stale_calls=stale_calls,
            bp_retry_calls=bp_retry_calls,
            was_bp_retry=retrying,
        )

    def finalize_fn(final: _Carry) -> Solution:
        max_iter_hit = (final.status == sol.STATUS_RUNNING) & (
            final.it >= o.max_iter
        )
        status = jnp.where(
            max_iter_hit, jnp.asarray(sol.STATUS_MAX_ITER, jnp.int32),
            final.status,
        )
        # Reference success semantics (iLQG.c:367-378): backPassDone and not
        # max_iter exhausted.
        success = final.back_pass_done & (final.it < o.max_iter)
        return Solution(
            success=success,
            xs=final.xs,
            us=final.us,
            cost=final.cost,
            iterations=final.it,
            g_norm=final.g_norm,
            lam=final.lam,
            dlam=final.dlam,
            w_pen_l=final.w_pen_l,
            w_pen_f=final.w_pen_f,
            status=status,
            dcost=final.dcost,
            expected=final.expected,
            z=final.z,
            log_linesearch=final.log_linesearch,
            log_z=final.log_z,
            log_cost=final.log_cost,
            body_calls=final.body_calls,
            stale_calls=final.stale_calls,
            bp_retry_calls=final.bp_retry_calls,
        )

    return init_fn, body_fn, finalize_fn


@functools.lru_cache(maxsize=64)
def make_solver(problem: Problem, options: SolverOptions = SolverOptions()):
    """Build the jitted solver ``(x0, u0, params) -> Solution``.

    Counterpart of the whole build+MEX pipeline of the reference
    (``make_iLQG.m`` + ``iLQG_mex.c``): "generation" is JAX tracing at first
    call; the returned function is cached per (problem, options).

    * ``x0``: (n_x,) initial state
    * ``u0``: (N, n_u) initial nominal controls (defines the horizon)
    * ``params``: problem-parameter pytree (free symbols of the reference,
      ``genenerator_main.mac:131-169``); scalars, fixed arrays, and
      ``[k]``-indexed time-varying arrays of length N+1 all work.
    """
    o = options
    init_fn, body_fn, finalize_fn = _make_parts(problem, options)

    def solve_fn(x0: Array, u0: Array, params: Any) -> Solution:
        carry0 = init_fn(x0, u0, params)
        final = lax.while_loop(
            lambda c: (~c.done) & (c.it < o.max_iter),
            lambda c: body_fn(c, params),
            carry0,
        )
        return finalize_fn(final)

    return jax.jit(solve_fn)


def solve(
    problem: Problem,
    x0,
    u0,
    params: Any,
    options: SolverOptions = SolverOptions(),
) -> Solution:
    """One-call convenience API: ``solve(problem, x0, u0, params, options)``.

    Mirrors the MEX call ``iLQG<Problem>(x0, u_nom, params, opt_params)``
    (``iLQG_mex.c:32-33``)."""
    return make_solver(problem, options)(x0, u0, params)


def make_batched_solver(
    problem: Problem,
    options: SolverOptions = SolverOptions(),
    batch_params: bool = False,
):
    """vmap the full solver over a leading instance-batch axis.

    The reference solves exactly one ``(x0, u_nom)`` per process
    (``iLQG_mex.c:19-144``); on TPU the batch axis is where the throughput
    comes from (SURVEY.md section 2, data-parallelism row).  ``batch_params``
    batches the parameter pytree too (multi-problem batches).
    """
    base = make_solver(problem, options)
    in_axes = (0, 0, 0 if batch_params else None)
    return jax.jit(jax.vmap(base, in_axes=in_axes))


class StepwiseSolver:
    """Host-driven batched solver: bounded chunks of iterations per device
    call (see module docstring).  Semantically identical to
    :func:`make_batched_solver`; the carry stays on device between calls.

    ``compact_levels > 0`` enables **active-lane compaction**: per-lane
    iteration counts are heavy-tailed (a batch's wall time is set by its
    *slowest* instance while the mean lane finishes much earlier, so late
    chunks run mostly converged, masked-out lanes).  When the active count
    drops to half the working size, finished lanes are scattered back into
    the full-batch carry and the active ones regathered into a half-size
    working set -- each shrink doubles the throughput of the remaining tail.
    Per-lane trajectories are bit-identical with or without compaction (each
    lane sees the same iteration sequence; only its batch neighbors change).
    """

    def __init__(
        self,
        problem: Problem,
        options: SolverOptions = SolverOptions(),
        chunk: int = 10,
        batch_params: bool = False,
        donate: bool = True,
        compact_levels: int = 4,
        min_compact_batch: int = 128,
        mesh=None,
        mesh_axis: str = "batch",
        pipeline_depth: int = 1,
        inline_below: int = 0,
    ):
        """``mesh``: optional 1-D ``jax.sharding.Mesh``.  When given, the
        batch axis of every heavy program (init / chunk-of-iterations /
        finalize) runs under ``shard_map``: each device executes the full
        production pipeline -- masked iteration body, Pallas kernels, staged
        line search -- on its LOCAL batch shard, with no collectives inside
        a chunk (instances are independent).  Only the host-loop scalars
        (active count, status stats) and the rare compaction reshuffles are
        global.  This is the multi-chip form of the reference's
        one-instance-per-process scaling (``iLQG_mex.c:19-144``), riding the
        mesh instead of process count.

        ``inline_below``: working-set widths <= this threshold run their
        chunk programs with ``lam_retry="inline"`` (the reference's inner
        while around only the backward pass, ``iLQG.c:261-284``) instead of
        the deferred placement.  Per-lane results are mode-invariant (the
        lambda/attempt sequences are identical -- pinned by
        ``test_lam_retry_inline_matches_deferred``), but the SCHEDULING
        economics flip with width: at full width a batch-wide inner while
        runs max-over-lanes rungs of an expensive kernel (deferred wins,
        BASELINE.md round-4 A/B), while in the compacted tail the kernel is
        cheap and retry-heavy straggler lanes otherwise burn whole body
        calls (with emission + masked line search) per rung.  0 disables.
        NB: ``Solution.bp_retry_calls`` counts kernel attempts for
        iterations executed in inline chunks (see solution.py)."""
        self.options = options
        self.chunk = chunk
        self.compact_levels = compact_levels
        self.min_compact_batch = min_compact_batch
        self.batch_params = batch_params
        self.mesh = mesh
        self.pipeline_depth = max(1, pipeline_depth)
        self.inline_below = inline_below
        o = options
        init_fn, body_fn, finalize_fn = _make_parts(problem, options)
        if inline_below > 0 and o.lam_retry != "inline":
            _, body_fn_inline, _ = _make_parts(
                problem, options.replace(lam_retry="inline")
            )
        else:
            body_fn_inline = body_fn

        p_axis = 0 if batch_params else None
        init_v = jax.vmap(init_fn, in_axes=(0, 0, p_axis))
        fin_v = jax.vmap(finalize_fn)

        if mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            self._n_shards = mesh.devices.size
            pb = P(mesh_axis)
            pp = pb if batch_params else P()
            init_v = shard_map(
                init_v, mesh=mesh, in_specs=(pb, pb, pp), out_specs=pb,
                check_vma=False,
            )
            fin_v = shard_map(
                fin_v, mesh=mesh, in_specs=(pb,), out_specs=pb,
                check_vma=False,
            )
        else:
            self._n_shards = 1

        def make_chunk(chunk_len: int, inline: bool = False):
            bf = body_fn_inline if inline else body_fn

            def chunk_fn(carry: _Carry, params):
                def cond(s):
                    i, c = s
                    return (i < chunk_len) & (~c.done) & (c.it < o.max_iter)

                def body(s):
                    i, c = s
                    return i + 1, bf(c, params)

                _, out = lax.while_loop(
                    cond, body, (jnp.asarray(0, jnp.int32), carry)
                )
                return out

            cv = jax.vmap(chunk_fn, in_axes=(0, p_axis))

            # Active count computed in the SAME program as the chunk: every
            # host dispatch is ~tens of ms of serialized RPC on relayed
            # backends, so a separate _active call per chunk doubled the
            # loop's dispatch bill.  Under a mesh the count is a per-shard
            # partial + scalar psum INSIDE the shard_map'd program -- the
            # only collective the chunk program is allowed to contain (the
            # precise invariant asserted by test_mesh_stepwise: any
            # all-reduce operand must be a scalar; never a gather of the
            # carry/bundle).
            def _count(c):
                return jnp.sum(
                    ((~c.done) & (c.it < o.max_iter)).astype(jnp.int32)
                )

            if mesh is not None:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                def chunk_and_count_local(carry, params):
                    out = cv(carry, params)
                    act = lax.psum(_count(out), mesh_axis)
                    return out, act

                chunk_and_count = shard_map(
                    chunk_and_count_local, mesh=mesh,
                    in_specs=(P(mesh_axis), pp),
                    out_specs=(P(mesh_axis), P()),
                    check_vma=False,
                )
            else:
                def chunk_and_count(carry, params):
                    out = cv(carry, params)
                    return out, _count(out)

            return jax.jit(chunk_and_count,
                           donate_argnums=(0,) if donate else ())

        self._chunk_cache: dict = {}
        self._make_chunk = make_chunk

        self._init = jax.jit(init_v)
        # Back-compat handle (fixed-length chunk program at the base length).
        self._chunk = self._chunk_for(chunk)
        self._finalize = jax.jit(fin_v)
        self._active = jax.jit(
            lambda c: jnp.sum(((~c.done) & (c.it < o.max_iter)).astype(jnp.int32))
        )

        def _status_stats(c):
            # Per-chunk console stats (debug_level >= 1): active-lane cost
            # mean and lambda range -- the reference's per-iteration PRNT
            # trace intent (iLQG.c:313-314,352-353) at one host sync per
            # chunk (the host loop already syncs the active count anyway).
            act = (~c.done) & (c.it < o.max_iter)
            n = jnp.maximum(jnp.sum(act.astype(jnp.int32)), 1)
            mean_cost = jnp.sum(jnp.where(act, c.cost, 0.0)) / n
            mean_it = jnp.sum(jnp.where(act, c.it, 0)) / n
            big = jnp.asarray(jnp.inf, c.lam.dtype)
            lam_lo = jnp.min(jnp.where(act, c.lam, big))
            lam_hi = jnp.max(jnp.where(act, c.lam, -big))
            # ONE stacked array -> one host transfer (each scalar fetch is a
            # full round trip on relayed backends).
            return jnp.stack([
                mean_cost.astype(c.cost.dtype), mean_it.astype(c.cost.dtype),
                lam_lo.astype(c.cost.dtype), lam_hi.astype(c.cost.dtype),
            ])

        self._stats = jax.jit(_status_stats)
        # Final-writeback scatter (jit re-specializes per working-set
        # shape): after the loop, the compacted working set is scattered
        # back into the full carry before finalize.  All mid-run
        # compaction goes through _compact_fused below.
        self._scatter = jax.jit(
            lambda full, idx, small: jax.tree_util.tree_map(
                lambda f, s: f.at[idx].set(s), full, small
            ),
            donate_argnums=(0,),
        )

        # Fused one-dispatch compaction: scatter the current working set
        # back (when it was itself compacted), compute the actives-first
        # order, and gather the new (half-size) working set -- in ONE
        # device program.  The separate scatter/order/gather calls cost 3
        # serialized host round trips (~25 ms each on relayed backends)
        # per compaction event; a solve compacts up to compact_levels
        # times.  jit re-specializes per (full, small, new_size) shapes.
        def _compact(full, small, idx, new_size: int):
            # small/idx are None on the FIRST compaction (the working set
            # IS the full carry -- nothing to scatter back).
            if idx is not None:
                full = jax.tree_util.tree_map(
                    lambda f, s: f.at[idx].set(s), full, small
                )
            order = jnp.argsort(
                (full.done | (full.it >= o.max_iter)).astype(jnp.int32),
                stable=True,
            )
            new_idx = order[:new_size]
            new_small = jax.tree_util.tree_map(
                lambda a: a[new_idx], full
            )
            return full, new_small, new_idx

        self._compact_fused = jax.jit(
            _compact, static_argnums=(3,), donate_argnums=(0,)
        )

    def _chunk_for(self, chunk_len: int, inline: bool = False):
        key = (chunk_len, inline)
        f = self._chunk_cache.get(key)
        if f is None:
            f = self._make_chunk(chunk_len, inline)
            self._chunk_cache[key] = f
        return f

    def _inline_at(self, size: int) -> bool:
        """Use the inline-retry chunk program at this working-set width?"""
        return 0 < size <= self.inline_below

    def _chunk_len(self, size: int, B0: int) -> int:
        """Iterations per device call at working-set width ``size``.

        Scales INVERSELY with width (capped 16x): early full-width chunks
        are device-time-bound, but once compaction shrinks the working set
        the device time per chunk drops ~linearly while the host dispatch
        round trip (tens of ms on relayed backends) does not -- the tail
        of a solve was 17 of 33 dispatches on the bench.  A longer chunk
        at small width keeps device time per dispatch roughly constant,
        and costs nothing when lanes finish early: the in-chunk while
        exits as soon as every lane is done, so an oversized chunk never
        burns masked iterations.
        """
        return self.chunk * max(1, min(B0 // max(size, 1), 16))

    def _compact_sizes(self, B: int):
        """Working-set sizes this batch can shrink through (largest first)."""
        sizes, s, levels = [B], B, self.compact_levels
        while (
            levels > 0
            and s % 2 == 0
            and s // 2 >= self.min_compact_batch
            and (s // 2) % self._n_shards == 0
        ):
            s //= 2
            levels -= 1
            sizes.append(s)
        return sizes

    def precompile(self, x0s, u0s, params, max_workers: int = 8) -> float:
        """Compile every program a solve at this batch shape will need,
        CONCURRENTLY, before the first timed call.

        A full solve compiles the init program, one chunk program PER
        compaction working-set size, the finalize program and the small
        helpers -- serially on first use, mid-run.  jax releases the GIL
        during backend compilation, so compiling them from a thread pool
        overlaps the (remote-compile-latency-dominated on relayed TPU
        backends) work.  Returns elapsed seconds.  The counterpart of the
        reference's build-once contract (``make_iLQG.m:30-37``): pay
        "generation" once, up front.
        """
        import time as _time
        from concurrent.futures import ThreadPoolExecutor

        t0 = _time.time()
        B = int(jnp.shape(x0s)[0])
        carry_sd = jax.eval_shape(self._init, x0s, u0s, params)

        def zeros_like_sd(sd, size):
            return jax.tree_util.tree_map(
                lambda s: jnp.zeros((size,) + s.shape[1:], s.dtype), sd
            )

        def sub_params(size):
            if not self.batch_params:
                return params
            return jax.tree_util.tree_map(lambda a: a[:size], params)

        tasks = [lambda: self._init(x0s, u0s, params)]
        sizes = self._compact_sizes(B)
        for s in sizes:
            # NB: fresh zero carries per task -- _chunk donates its input.
            # Each compaction width runs its own chunk LENGTH (see
            # _chunk_len) and retry mode (see _inline_at), hence its own
            # program.
            cf = self._chunk_for(self._chunk_len(s, B), self._inline_at(s))
            tasks.append(
                lambda s=s, cf=cf: cf(zeros_like_sd(carry_sd, s),
                                      sub_params(s))
            )
        carry0 = zeros_like_sd(carry_sd, B)
        tasks.append(lambda: self._finalize(carry0))
        tasks.append(lambda: self._active(carry0))
        tasks.append(lambda: self._stats(carry0))
        if len(sizes) > 1:
            # Fused compaction program per size transition (see __call__):
            # the first halving sees (full=B-carry, None, None); later ones
            # (B-carry, prev-size working set, prev-size index).
            for i, s in enumerate(sizes[1:]):
                prev = sizes[i]
                if prev == B:
                    tasks.append(lambda s=s: self._compact_fused(
                        zeros_like_sd(carry_sd, B), None, None, s))
                else:
                    tasks.append(lambda s=s, prev=prev: self._compact_fused(
                        zeros_like_sd(carry_sd, B),
                        zeros_like_sd(carry_sd, prev),
                        jnp.arange(prev), s))
            # The final writeback before finalize is a plain scatter at
            # whatever size the solve ends on -- warm every candidate.
            for s in sizes[1:]:
                tasks.append(lambda s=s: self._scatter(
                    zeros_like_sd(carry_sd, B), jnp.arange(s),
                    zeros_like_sd(carry_sd, s)))
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            futures = [ex.submit(t) for t in tasks]
            for f in futures:
                f.result()
        return _time.time() - t0

    def __call__(self, x0s, u0s, params) -> Solution:
        import time as _time

        t_start = _time.time()
        o = self.options
        full = self._init(x0s, u0s, params)
        B = int(full.cost.shape[0])
        # Working set = the full batch until compaction kicks in.
        small, idx, size = full, None, B
        levels_left = self.compact_levels

        def sub_params(index):
            if not self.batch_params:
                return params
            return jax.tree_util.tree_map(lambda a: a[index], params)

        cur_params = params
        # Lambda-escalation retries do not advance iteration counters, so a
        # chunk may execute fewer than `chunk` counted iterations; loop on
        # the active count.  The cap is a true upper bound on body calls:
        # each counted iteration is preceded by at most n_lam_steps retries
        # (λ multiplies by at least lambdaFactor per consecutive failure, so
        # it walks lambdaMin -> lambdaMax in at most
        # log(λmax/λmin)/log(λfactor) attempts; the reference's inner while
        # has the same bound, iLQG.c:261-275).
        import numpy as _np

        lam_lo = max(o.lambdaMin, 1e-300)
        n_lam_steps = 2 + int(_np.ceil(
            _np.log(max(o.lambdaMax / lam_lo, 2.0)) / _np.log(o.lambdaFactor)
        ))
        # +1+depth: the pipelined active check lags `pipeline_depth` chunks
        # behind (see below).
        depth = self.pipeline_depth
        n_calls = (max(1, -(-o.max_iter * (1 + n_lam_steps) // self.chunk))
                   + 1 + depth)
        # The active-count check is PIPELINED `depth` chunks behind: jax
        # dispatch is async, so several chunks are enqueued before the
        # oldest count is fetched -- each host<->device round trip (tens of
        # ms of pure latency on relayed TPU backends, which dominated wall
        # time once the iteration body dropped to a few ms) overlaps
        # `depth` chunks of device work instead of one.  Costs at most
        # `depth` extra (empty: the vmapped while cond exits immediately)
        # chunk calls after all lanes finish, and delays compaction
        # decisions by `depth` chunks (the count only shrinks, so acting on
        # a stale count is merely conservative).  debug_level >= 1 keeps
        # the synchronous path: observability mode prints true per-chunk
        # state.
        exhausted = True
        from collections import deque

        pending = deque()  # device scalars: active counts of past chunks
        for chunk_i in range(n_calls):
            small, act_dev = self._chunk_for(
                self._chunk_len(size, B), self._inline_at(size)
            )(small, cur_params)
            if o.debug_level >= 1:
                import sys as _sys

                active = int(act_dev)
                mc, mi, llo, lhi = _np.asarray(self._stats(small))
                print(
                    f"chunk {chunk_i + 1}: active {active}/{size}"
                    f"  mean iter {mi:.1f}  mean cost {mc:.6g}"
                    f"  log10(lam) [{_np.log10(max(llo, 1e-300)):.1f},"
                    f" {_np.log10(max(lhi, 1e-300)):.1f}]"
                    f"  t={_time.time() - t_start:.1f}s",
                    file=_sys.stderr, flush=True,
                )
            else:
                pending.append(act_dev)
                if len(pending) <= depth:
                    continue
                active = int(pending.popleft())
            if active == 0:
                exhausted = False
                break
            while (
                levels_left > 0
                and size % 2 == 0
                and size // 2 >= self.min_compact_batch
                and (size // 2) % self._n_shards == 0
                and active <= size // 2
            ):
                size //= 2
                levels_left -= 1
                if idx is None:
                    # First compaction: the working set IS the full carry.
                    full, small, idx = self._compact_fused(
                        small, None, None, size
                    )
                else:
                    full, small, idx = self._compact_fused(
                        full, small, idx, size
                    )
                if self.batch_params:
                    cur_params = sub_params(idx)
        if exhausted and int(self._active(small)) != 0:
            # Unreachable under correct masking (see the bound above); fail
            # loudly rather than silently finalizing still-active lanes.
            raise RuntimeError(
                f"StepwiseSolver: {int(self._active(small))} lanes still "
                f"active after {n_calls} chunk calls (bound "
                f"max_iter*(1+{n_lam_steps})); this indicates a masking bug"
            )
        if idx is not None:
            full = self._scatter(full, idx, small)
        else:
            full = small
        return self._finalize(full)


def make_stepwise_solver(
    problem: Problem,
    options: SolverOptions = SolverOptions(),
    chunk: int = 10,
    batch_params: bool = False,
    mesh=None,
    pipeline_depth: int = 1,
    inline_below: int = 0,
) -> StepwiseSolver:
    return StepwiseSolver(problem, options, chunk=chunk,
                          batch_params=batch_params, mesh=mesh,
                          pipeline_depth=pipeline_depth,
                          inline_below=inline_below)
