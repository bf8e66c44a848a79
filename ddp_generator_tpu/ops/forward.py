"""Forward rollout (the generated ``forward_pass``, ``iLQG_func.tem:121-185``).

A strictly sequential ``lax.scan`` over the horizon:

* control update ``u = u_nom + alpha*l + L*(x - x_nom)`` with the reference's
  exact special case ``alpha == 0 => open-loop u_nom``
  (``iLQG_func.tem:145-158``),
* input clamping via the state-dependent ``clampU`` semantics
  (``iLQG_func.tem:68-73``),
* dynamics step and AL-augmented cost accumulation,
* NaN/Inf detection folded into an ``ok`` flag instead of the reference's
  per-assignment guards+early-return (``genenerator_main.mac:193-198``) --
  a failed rollout is reported exactly like the reference's return 0 and
  treated as a failed line-search candidate (``line_search.c:55-58``).

``cost_only=True`` re-evaluates the cost of an *existing* trajectory without
touching x,u -- used after penalty-weight/multiplier changes
(``iLQG.c:338,348``; ``forward_pass(..., cost_only=1)``).

Throughput on TPU comes from ``vmap`` over problem instances and line-search
alphas, not from this serial scan (see SURVEY.md section 2, sequence
parallelism row).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..al import augmented_F, augmented_L
from ..problem import Problem, clamp_u

Array = jax.Array


class Rollout(NamedTuple):
    xs: Array  # (N+1, n_x)
    us: Array  # (N, n_u)
    cost: Array  # scalar: total AL-augmented cost
    ok: Array  # scalar bool: everything finite


def forward_pass(
    problem: Problem,
    x0: Array,  # (n_x,)
    xs_nom: Array,  # (N+1, n_x)
    us_nom: Array,  # (N, n_u)
    l: Array,  # (N, n_u) feedforward gains
    L_gain: Array,  # (N, n_u, n_x) feedback gains
    alpha: Array,  # scalar step length; 0.0 => open loop
    p: Any,
    mu_le: Array,
    mu_li: Array,
    mu_fe: Array,
    mu_fi: Array,
    w_pen_l: Array,
    w_pen_f: Array,
    unroll: int = 1,
) -> Rollout:
    N = us_nom.shape[0]
    dtype = us_nom.dtype
    open_loop = alpha == 0.0

    def body(carry, inp):
        x, csum, ok = carry
        k, x_nom_k, u_nom_k, l_k, L_k, mle_k, mli_k = inp
        du = alpha * l_k + L_k @ (x - x_nom_k)
        # alpha==0.0 selects the exact open-loop branch (iLQG_func.tem:155-158)
        u = jnp.where(open_loop, u_nom_k, u_nom_k + du)
        u = clamp_u(problem, x, u, p, k)
        x_next = jnp.asarray(problem.f(x, u, p, k), dtype)
        c = augmented_L(problem, x, u, p, k, mle_k, mli_k, w_pen_l)
        ok = ok & jnp.all(jnp.isfinite(x_next)) & jnp.isfinite(c)
        return (x_next, csum + c, ok), (x, u, c)

    ks = jnp.arange(N)
    init = (x0.astype(dtype), jnp.zeros((), dtype), jnp.asarray(True))
    (x_final, csum, ok), (xs, us, _cs) = lax.scan(
        body, init, (ks, xs_nom[:N], us_nom, l, L_gain, mu_le, mu_li),
        unroll=unroll,
    )
    kf = jnp.asarray(N, jnp.int32)
    cf = augmented_F(problem, x_final, p, kf, mu_fe, mu_fi, w_pen_f)
    ok = ok & jnp.isfinite(cf)
    xs_all = jnp.concatenate([xs, x_final[None]], axis=0)
    return Rollout(xs=xs_all, us=us, cost=csum + cf, ok=ok)


def cost_only(
    problem: Problem,
    xs: Array,  # (N+1, n_x) existing trajectory
    us: Array,  # (N, n_u)
    p: Any,
    mu_le: Array,
    mu_li: Array,
    mu_fe: Array,
    mu_fi: Array,
    w_pen_l: Array,
    w_pen_f: Array,
) -> Array:
    """Cost of an existing trajectory under (possibly new) penalties.

    ``forward_pass(..., cost_only=1)`` in the reference skips the x,u updates
    and only re-evaluates the cost terms (``iLQG_func.tem:140-176`` guarded by
    ``!cost_only``).
    """
    N = us.shape[0]
    ks = jnp.arange(N)

    def step_cost(k, x, u, mle, mli):
        return augmented_L(problem, x, u, p, k, mle, mli, w_pen_l)

    cs = jax.vmap(step_cost)(ks, xs[:N], us, mu_le, mu_li)
    kf = jnp.asarray(N, jnp.int32)
    cf = augmented_F(problem, xs[N], p, kf, mu_fe, mu_fi, w_pen_f)
    return jnp.sum(cs) + cf
