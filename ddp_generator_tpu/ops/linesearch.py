"""Multi-alpha line search.

The reference evaluates its (default 8-point) alpha schedule *serially* with
early exit (``line_search.c:33-78``); its planned multi-threaded variant was
never implemented (``README.md:9``, unused buffers ``iLQG.h:71-73``).  Here
all alphas roll out simultaneously via ``vmap`` -- on TPU the extra rollouts
are nearly free (they batch onto the same vector units) -- and the accepted
candidate is the *first* (largest) alpha with ``z > zMin``, selected by masked
argmax, which is semantically identical to the serial early-exit.

Reported quantities mirror the reference exactly: on success they come from
the accepted alpha; when every alpha fails, ``new_cost``/``dcost``/
``expected`` come from the last alpha tried (``line_search.c:70-76`` leaves
the loop variables from the final iteration).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .forward import forward_pass

Array = jax.Array


class LineSearchResult(NamedTuple):
    success: Array  # scalar bool
    xs: Array  # (N+1, n_x) accepted candidate trajectory
    us: Array  # (N, n_u)
    new_cost: Array
    dcost: Array
    expected: Array
    z: Array
    alpha_index: Array  # int32 index into the alpha schedule (n_alpha if none)


def line_search(
    problem,
    alphas: Array,  # (n_alpha,)
    x0: Array,
    xs_nom: Array,
    us_nom: Array,
    l: Array,
    L_gain: Array,
    dV: Array,  # (2,)
    cost: Array,
    z_min: float,
    p: Any,
    mu_le: Array,
    mu_li: Array,
    mu_fe: Array,
    mu_fi: Array,
    w_pen_l: Array,
    w_pen_f: Array,
    unroll: int = 1,
) -> LineSearchResult:
    n_alpha = alphas.shape[0]

    def try_alpha(alpha):
        return forward_pass(
            problem, x0, xs_nom, us_nom, l, L_gain, alpha, p,
            mu_le, mu_li, mu_fe, mu_fi, w_pen_l, w_pen_f, unroll=unroll,
        )

    rollouts = jax.vmap(try_alpha)(alphas)

    dcost = cost - rollouts.cost  # (n_alpha,)
    expected = -alphas * (dV[0] + alphas * dV[1])
    z = jnp.where(expected > 0.0, dcost / expected, 0.0)
    accepted = rollouts.ok & (z > z_min)

    # First accepted alpha == largest alpha (alphas are monotonically
    # decreasing, options.py), mirroring the serial early exit.
    idx_first = jnp.argmax(accepted)  # first True, or 0 if none
    any_ok = jnp.any(accepted)
    # On total failure the reference reports the last alpha's numbers.
    idx = jnp.where(any_ok, idx_first, n_alpha - 1)

    take = lambda a: a[idx]
    return LineSearchResult(
        success=any_ok,
        xs=take(rollouts.xs),
        us=take(rollouts.us),
        new_cost=take(rollouts.cost),
        dcost=take(dcost),
        expected=take(expected),
        z=take(z),
        alpha_index=jnp.where(any_ok, idx, jnp.asarray(n_alpha, jnp.int32)).astype(
            jnp.int32
        ),
    )
