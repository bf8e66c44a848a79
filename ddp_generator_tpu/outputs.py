"""Optional user outputs ("g") along a trajectory.

The reference lets a problem define an auxiliary output array ``g`` whose
expressions are evaluated per step via the generated ``calcG`` /
``get_g_size`` (``iLQG_func.tem:511-521``; prototypes ``iLQG.h:87-88``) --
e.g. internal forces or performance signals derived from (x, u, params, k).

Here: pass ``g(x, u, p, k) -> (n_g,)`` and evaluate it over whole
trajectories (vmapped over the horizon, jit-compiled, batchable).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

Array = jax.Array
OutputFn = Callable[..., Array]  # g(x, u, p, k) -> (n_g,)


def get_g_size(g: OutputFn, n_x: int, n_u: int, params: Any) -> int:
    """Static output dimension (``get_g_size``, ``iLQG_func.tem:511-513``)."""
    x = jnp.zeros((n_x,))
    u = jnp.zeros((n_u,))
    shape = jax.eval_shape(g, x, u, params, 0)
    if len(shape.shape) != 1:
        raise ValueError(f"g must return a 1-D vector, got shape {shape.shape}")
    return int(shape.shape[0])


def calc_g(g: OutputFn, xs: Array, us: Array, params: Any) -> Array:
    """Evaluate g at every running step of a trajectory.

    ``xs``: (N+1, n_x), ``us``: (N, n_u) -> (N, n_g).  Equivalent of calling
    the generated ``calcG`` for each k (``iLQG_func.tem:515-521``).
    """
    N = us.shape[0]
    ks = jnp.arange(N)
    return jax.vmap(lambda k, x, u: g(x, u, params, k))(ks, xs[:N], us)


def make_output_fn(g: OutputFn):
    """Jitted trajectory-output evaluator; vmap for solution batches."""
    return jax.jit(lambda xs, us, params: calc_g(g, xs, us, params))
