"""Solution pytree returned by the solver.

Field set mirrors the MEX outputs ``(success, x_new, u_new, new_cost)``
(``iLQG_mex.c:88-98,127-137``) plus the optSet observability fields the
reference keeps internally (``iterations``, ``g_norm``, ``lambda``, ``dV``,
per-iteration logs ``log_linesearch``/``log_z``/``log_cost`` -- latent,
never-allocated API in the reference, ``iLQG.h:56-58``; allocated for real
here).
"""

from __future__ import annotations

from typing import NamedTuple

import jax

Array = jax.Array

# Status codes (reason for termination)
STATUS_RUNNING = 0
STATUS_SUCCESS_GRADIENT = 1  # g_norm < tolGrad && lambda < 1e-5 (iLQG.c:297)
STATUS_SUCCESS_TOLFUN = 2  # dcost < tolFun (iLQG.c:329)
STATUS_EXIT_LAMBDA_MAX = 3  # lambda > lambdaMax after reject (iLQG.c:356)
STATUS_NO_DESCENT = 4  # back pass never succeeded (iLQG.c:367-371)
STATUS_DERIVS_FAILED = 5  # NaN/Inf in derivatives (iLQG.c:247-249)
STATUS_INIT_FAILED = 6  # initial rollout not finite
STATUS_MAX_ITER = 7  # iteration budget exhausted (iLQG.c:372-376)


class Solution(NamedTuple):
    success: Array  # bool; reference return-value semantics (iLQG.c:367-378)
    xs: Array  # (N+1, n_x) optimized state trajectory
    us: Array  # (N, n_u) optimized inputs
    cost: Array  # final (AL-augmented) cost
    iterations: Array  # int32, as o->iterations (iLQG.c:365)
    g_norm: Array
    lam: Array  # final lambda
    dlam: Array
    w_pen_l: Array
    w_pen_f: Array
    status: Array  # int32, STATUS_* above
    dcost: Array
    expected: Array
    z: Array
    log_linesearch: Array  # (max_iter,) int32: #alphas tried (line_search.c:70)
    log_z: Array  # (max_iter,)
    log_cost: Array  # (max_iter,)
    # Instrumentation (no reference counterpart): how many times the
    # iteration body actually processed this lane, and how many of those
    # calls re-derived a STALE derivative bundle (reject/lambda-retry calls,
    # where the reference skips calc_derivs via its newDeriv gate,
    # iLQG.c:241-256, but this solver recomputes from frozen inputs --
    # see _Carry.w_pen_l_d).  stale_calls / body_calls is the fraction of
    # derivative work a newDeriv gate could save.
    body_calls: Array  # int32
    stale_calls: Array  # int32
    # lam_retry="deferred" (default): split of stale_calls -- stale calls
    # entered from a lambda-escalation retry (previous call's backward pass
    # failed, iLQG.c:261-284) vs from a line-search reject (iLQG.c:340-361).
    # The two have different remedies: bp-retries could re-run only the
    # backward pass in-body, LS-rejects genuinely need backpass + line
    # search again (only the derivative re-emission is waste).
    # lam_retry="inline": counts inner-while kernel ATTEMPTS instead
    # (solver._lam_retry_loop) -- not body calls and NOT a subset of
    # stale_calls, so don't difference the two in that mode.
    # StepwiseSolver(inline_below=W) mixes both units in one lane's count
    # (deferred chunks at full width, inline chunks in the tail).
    bp_retry_calls: Array  # int32
