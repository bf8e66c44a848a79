"""Augmented-Lagrangian handling of general constraints.

Reproduces the penalty construction the reference generator folds into ``L``
and ``F`` before differentiation (``genenerator_main.mac:46-124``) and the
multiplier update rules emitted into ``update_multipliers_*``
(``iLQG_func.tem:417-509``; inequality scheme credited to D. Ruxton at
``iLQG_func.tem:446,492``):

* equality (hle/hfe):   ``p  = mu*h + 0.5*w_pen*h^2``
                        ``mu+ = mu + w_pen*h``
* inequality (hli/hfi): ``p  = mu*h*(1 + w_pen*h)``        if ``h >= 0``
                        ``p  = mu*h / (1 - w_pen*h)``      otherwise
                        ``mu+ = mu*(1 + 2*w_pen*h)``       if ``h >= 0``
                        ``mu+ = mu*(1 - w_pen*h)^-2``      otherwise

Initial multipliers: 0 for equalities, 1 for inequalities
(``iLQG_func.tem:371-400``).  Penalty weights ``w_pen_l`` (running) and
``w_pen_f`` (final) increase by ``w_pen_fact1`` when a constraint violation
did not shrink enough (``iLQG_func.tem:428-440,456-487``).

Differentiation through the piecewise inequality penalty uses ``jnp.where``,
whose gradient selects the active branch's gradient -- the same semantics as
the reference's ``diff``-through-``if`` rules (``gen_dep_graph.mac:178-184``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .problem import Problem

Array = jax.Array


class Multipliers(NamedTuple):
    """AL multiplier state (reference ``multipliers_t``, iLQG_problem.tem:65-89).

    Running multipliers are per-step arrays of shape ``(N, n)``; final ones
    ``(n,)``.  ``last_*`` record the constraint values at the last multiplier
    update, used by the penalty-increase test.
    """

    mu_le: Array  # (N, n_hle)
    mu_li: Array  # (N, n_hli)
    mu_fe: Array  # (n_hfe,)
    mu_fi: Array  # (n_hfi,)
    last_hle: Array  # (N, n_hle)
    last_hli: Array  # (N, n_hli)
    last_hfe: Array  # (n_hfe,)
    last_hfi: Array  # (n_hfi,)


def init_multipliers(problem: Problem, n_hor: int, dtype) -> Multipliers:
    """mu_e = 0, mu_i = 1, last_h = 0 (``iLQG_func.tem:371-400``)."""
    z = lambda *s: jnp.zeros(s, dtype)
    o = lambda *s: jnp.ones(s, dtype)
    return Multipliers(
        mu_le=z(n_hor, problem.n_hle),
        mu_li=o(n_hor, problem.n_hli),
        mu_fe=z(problem.n_hfe),
        mu_fi=o(problem.n_hfi),
        last_hle=z(n_hor, problem.n_hle),
        last_hli=z(n_hor, problem.n_hli),
        last_hfe=z(problem.n_hfe),
        last_hfi=z(problem.n_hfi),
    )


def _eq_penalty(mu: Array, h: Array, w_pen: Array) -> Array:
    return mu * h + 0.5 * w_pen * h * h


def _ineq_penalty(mu: Array, h: Array, w_pen: Array) -> Array:
    # Ruxton: active branch mu*h*(1+w*h); inactive mu*h/(1-w*h).
    active = mu * h * (1.0 + w_pen * h)
    inactive = mu * h / (1.0 - w_pen * h)
    return jnp.where(h >= 0.0, active, inactive)


def running_constraint_values(
    problem: Problem, x: Array, u: Array, p: Any, k: Array, dtype
) -> tuple[Array, Array]:
    """(hle values, hli values) at one step, shapes (n_hle,), (n_hli,)."""
    hle = (
        jnp.stack([fn(x, u, p, k) for fn in problem.hle]).astype(dtype)
        if problem.n_hle
        else jnp.zeros((0,), dtype)
    )
    hli = (
        jnp.stack([fn(x, u, p, k) for fn in problem.hli]).astype(dtype)
        if problem.n_hli
        else jnp.zeros((0,), dtype)
    )
    return hle, hli


def final_constraint_values(
    problem: Problem, x: Array, p: Any, k: Array, dtype
) -> tuple[Array, Array]:
    hfe = (
        jnp.stack([fn(x, p, k) for fn in problem.hfe]).astype(dtype)
        if problem.n_hfe
        else jnp.zeros((0,), dtype)
    )
    hfi = (
        jnp.stack([fn(x, p, k) for fn in problem.hfi]).astype(dtype)
        if problem.n_hfi
        else jnp.zeros((0,), dtype)
    )
    return hfe, hfi


def augmented_L(
    problem: Problem,
    x: Array,
    u: Array,
    p: Any,
    k: Array,
    mu_le: Array,
    mu_li: Array,
    w_pen_l: Array,
) -> Array:
    """Running cost with AL penalties folded in (``genenerator_main.mac:89-124``)."""
    c = problem.L(x, u, p, k)
    dtype = jnp.result_type(c)
    hle, hli = running_constraint_values(problem, x, u, p, k, dtype)
    if problem.n_hle:
        c = c + jnp.sum(_eq_penalty(mu_le, hle, w_pen_l))
    if problem.n_hli:
        c = c + jnp.sum(_ineq_penalty(mu_li, hli, w_pen_l))
    return c


def augmented_F(
    problem: Problem,
    x: Array,
    p: Any,
    k: Array,
    mu_fe: Array,
    mu_fi: Array,
    w_pen_f: Array,
) -> Array:
    """Final cost with AL penalties folded in (``genenerator_main.mac:46-87``)."""
    c = problem.F(x, p, k)
    dtype = jnp.result_type(c)
    hfe, hfi = final_constraint_values(problem, x, p, k, dtype)
    if problem.n_hfe:
        c = c + jnp.sum(_eq_penalty(mu_fe, hfe, w_pen_f))
    if problem.n_hfi:
        c = c + jnp.sum(_ineq_penalty(mu_fi, hfi, w_pen_f))
    return c


class MultiplierUpdate(NamedTuple):
    multipliers: Multipliers
    w_pen_l: Array
    w_pen_f: Array


def update_multipliers(
    problem: Problem,
    xs: Array,  # (N+1, n_x) nominal states (xs[N] is the final state)
    us: Array,  # (N, n_u) nominal inputs
    p: Any,
    mult: Multipliers,
    w_pen_l: Array,
    w_pen_f: Array,
    w_pen_max_l: Array,
    w_pen_max_f: Array,
    w_pen_fact1: float,
    tolConstraint: float,
    init: bool,
) -> MultiplierUpdate:
    """Functional ``update_multipliers`` (``iLQG_func.tem:417-509``).

    With ``init=True`` only ``last_*`` are recorded (multipliers and penalty
    weights untouched), matching the ``init`` early-returns at
    ``iLQG_func.tem:443,489``.
    """
    N = us.shape[0]
    dtype = us.dtype

    def running_h(k):
        return running_constraint_values(problem, xs[k], us[k], p, k, dtype)

    if problem.n_hle or problem.n_hli:
        ks = jnp.arange(N)
        hle_all, hli_all = jax.vmap(running_h)(ks)  # (N, n_hle), (N, n_hli)
    else:
        hle_all = jnp.zeros((N, 0), dtype)
        hli_all = jnp.zeros((N, 0), dtype)

    kf = jnp.asarray(N, jnp.int32)
    hfe, hfi = final_constraint_values(problem, xs[N], p, kf, dtype)

    # increase_pen tests (iLQG_func.tem:428-440, 471-483)
    inc_l = jnp.zeros((), bool)
    if problem.n_hle:
        inc_l |= jnp.any(
            (jnp.abs(hle_all) > tolConstraint)
            & (w_pen_fact1 * jnp.abs(hle_all) > jnp.abs(mult.last_hle))
        )
    if problem.n_hli:
        inc_l |= jnp.any(
            (hli_all > tolConstraint) & (w_pen_fact1 * hli_all > mult.last_hli)
        )
    inc_f = jnp.zeros((), bool)
    if problem.n_hfe:
        inc_f |= jnp.any(
            (jnp.abs(hfe) > tolConstraint)
            & (w_pen_fact1 * jnp.abs(hfe) > jnp.abs(mult.last_hfe))
        )
    if problem.n_hfi:
        inc_f |= jnp.any((hfi > tolConstraint) & (w_pen_fact1 * hfi > mult.last_hfi))

    if init:
        new_mult = mult._replace(
            last_hle=hle_all, last_hli=hli_all, last_hfe=hfe, last_hfi=hfi
        )
        return MultiplierUpdate(new_mult, w_pen_l, w_pen_f)

    # Multiplier updates -- evaluated with the *current* w_pen (the generated
    # code updates w_pen only after the mu updates, iLQG_func.tem:456-457,486).
    mu_le = mult.mu_le + w_pen_l * hle_all
    mu_li = jnp.where(
        hli_all >= 0.0,
        mult.mu_li * (1.0 + 2.0 * w_pen_l * hli_all),
        mult.mu_li * (1.0 - w_pen_l * hli_all) ** -2,
    )
    mu_fe = mult.mu_fe + w_pen_f * hfe
    mu_fi = jnp.where(
        hfi >= 0.0,
        mult.mu_fi * (1.0 + 2.0 * w_pen_f * hfi),
        mult.mu_fi * (1.0 - w_pen_f * hfi) ** -2,
    )

    new_w_pen_l = jnp.where(
        inc_l, jnp.minimum(w_pen_max_l, w_pen_l * w_pen_fact1), w_pen_l
    )
    new_w_pen_f = jnp.where(
        inc_f, jnp.minimum(w_pen_max_f, w_pen_f * w_pen_fact1), w_pen_f
    )

    new_mult = Multipliers(
        mu_le=mu_le,
        mu_li=mu_li,
        mu_fe=mu_fe,
        mu_fi=mu_fi,
        last_hle=hle_all,
        last_hli=hli_all,
        last_hfe=hfe,
        last_hfi=hfi,
    )
    return MultiplierUpdate(new_mult, new_w_pen_l, new_w_pen_f)
