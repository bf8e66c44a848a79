"""Derivative bundles via JAX autodiff.

This module is the TPU-native replacement for the entire offline symbolic
pipeline of the reference: Maxima ``jacobian``/``hessian`` expansion
(``genenerator_main.mac:333-371``), the aux-variable chain rule
(``gen_dep_graph.mac:186-229``) and the gentran-emitted ``calc_derivs`` /
``bp_derivsL`` / ``bp_derivsF`` C code (``iLQG_func.tem:187-310``).  JAX
tracing + ``jacfwd``/``jacrev`` produce the same quantities at jit time; XLA
constant-folding subsumes the reference's time-invariant precompute
(``init_running``/``init_final``, ``iLQG_func.tem:312-362``).

Quantities produced per running step k (names as in ``trajEl_t``,
``iLQG_problem.tem:23-51``):

* ``fx (n_x,n_x)``, ``fu (n_x,n_u)``: dynamics Jacobians
* ``fxx (n_x,n_x,n_x)``, ``fuu (n_x,n_u,n_u)``, ``fxu (n_x,n_x,n_u)``:
  second-order dynamics tensors (only when FULL_DDP; ``iLQG.h:4-6``)
* ``cx, cu, cxx, cuu, cxu``: derivatives of the AL-augmented running cost
* ``lower/upper/lower_hx/upper_hx/lower_sign/upper_sign``: input box bounds
  from the ``h`` constraints (``limitsU``, ``iLQG_func.tem:75-119``)

and for the final stage (``trajFin_t``): ``cx_f``, ``cxx_f`` of the
AL-augmented final cost.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .al import augmented_F, augmented_L
from .problem import Problem, limits_u

Array = jax.Array


class StepDerivs(NamedTuple):
    """Per-step derivative data, stacked over the horizon (leading dim N)."""

    fx: Array
    fu: Array
    cx: Array
    cu: Array
    cxx: Array
    cuu: Array
    cxu: Array  # d2L/(dx du), (n_x, n_u) per step -- reference Lxu layout
    fxx: Array  # zero-size placeholder when full_ddp=False
    fuu: Array
    fxu: Array
    lower: Array
    upper: Array
    lower_hx: Array
    upper_hx: Array
    lower_sign: Array
    upper_sign: Array


class FinalDerivs(NamedTuple):
    cx: Array
    cxx: Array


class DerivBundle(NamedTuple):
    step: StepDerivs
    final: FinalDerivs
    ok: Array  # scalar bool: all derivatives finite (NaN/Inf guard, see below)


def _tree_finite(*arrays: Array) -> Array:
    ok = jnp.asarray(True)
    for a in arrays:
        if a.size:
            ok &= jnp.all(jnp.isfinite(a))
    return ok


def calc_derivs(
    problem: Problem,
    xs: Array,  # (N+1, n_x) nominal trajectory
    us: Array,  # (N, n_u) nominal inputs
    p: Any,
    mu_le: Array,  # (N, n_hle)
    mu_li: Array,  # (N, n_hli)
    mu_fe: Array,
    mu_fi: Array,
    w_pen_l: Array,
    w_pen_f: Array,
    full_ddp: bool,
) -> DerivBundle:
    """Differentiate dynamics and cost along the nominal trajectory.

    Functional counterpart of the generated ``calc_derivs``
    (``iLQG_func.tem:187-221``): final-stage Fx/Fxx, then per step k the
    dynamics Jacobians (and 2nd-order tensors when FULL_DDP), cost
    derivatives of the AL-augmented running cost, and the input box limits.
    The ``ok`` flag mirrors the generated per-assignment NaN/Inf guards
    (``genenerator_main.mac:193-198``): any non-finite derivative marks the
    whole bundle failed, which aborts the outer loop as in ``iLQG.c:247-249``.
    """
    N = us.shape[0]
    n_x, n_u = problem.n_x, problem.n_u
    dtype = us.dtype

    def L_aug(x, u, k, mle, mli):
        return augmented_L(problem, x, u, p, k, mle, mli, w_pen_l)

    def f_fn(x, u, k):
        return jnp.asarray(problem.f(x, u, p, k), dtype)

    def step(k, x, u, mle, mli):
        fx = jax.jacfwd(f_fn, argnums=0)(x, u, k)
        fu = jax.jacfwd(f_fn, argnums=1)(x, u, k)
        cx = jax.grad(L_aug, argnums=0)(x, u, k, mle, mli)
        cu = jax.grad(L_aug, argnums=1)(x, u, k, mle, mli)
        cxx = jax.jacfwd(jax.grad(L_aug, argnums=0), argnums=0)(x, u, k, mle, mli)
        cuu = jax.jacfwd(jax.grad(L_aug, argnums=1), argnums=1)(x, u, k, mle, mli)
        cxu = jax.jacfwd(jax.grad(L_aug, argnums=0), argnums=1)(x, u, k, mle, mli)
        if full_ddp:
            fxx = jax.jacfwd(jax.jacfwd(f_fn, argnums=0), argnums=0)(x, u, k)
            fuu = jax.jacfwd(jax.jacfwd(f_fn, argnums=1), argnums=1)(x, u, k)
            fxu = jax.jacfwd(jax.jacfwd(f_fn, argnums=0), argnums=1)(x, u, k)
        else:
            fxx = jnp.zeros((0, 0, 0), dtype)
            fuu = jnp.zeros((0, 0, 0), dtype)
            fxu = jnp.zeros((0, 0, 0), dtype)
        lo, up, lo_hx, up_hx, lo_s, up_s = limits_u(problem, x, u, p, k)
        return StepDerivs(
            fx=fx,
            fu=fu,
            cx=cx,
            cu=cu,
            cxx=cxx,
            cuu=cuu,
            cxu=cxu,
            fxx=fxx,
            fuu=fuu,
            fxu=fxu,
            lower=lo,
            upper=up,
            lower_hx=lo_hx,
            upper_hx=up_hx,
            lower_sign=lo_s,
            upper_sign=up_s,
        )

    ks = jnp.arange(N)
    sd = jax.vmap(step)(ks, xs[:N], us, mu_le, mu_li)

    kf = jnp.asarray(N, jnp.int32)

    def F_aug(x):
        return augmented_F(problem, x, p, kf, mu_fe, mu_fi, w_pen_f)

    cx_f = jax.grad(F_aug)(xs[N])
    cxx_f = jax.jacfwd(jax.grad(F_aug))(xs[N])
    fd = FinalDerivs(cx=cx_f, cxx=cxx_f)

    ok = _tree_finite(
        sd.fx, sd.fu, sd.cx, sd.cu, sd.cxx, sd.cuu, sd.cxu,
        sd.fxx, sd.fuu, sd.fxu, cx_f, cxx_f,
    )
    return DerivBundle(step=sd, final=fd, ok=ok)
