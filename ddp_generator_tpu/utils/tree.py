"""Small pytree helpers used across the solver."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_where(pred, a, b):
    """Elementwise ``where(pred, a, b)`` over matching pytrees (scalar pred)."""
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def tree_zeros_like_shape(shape_tree):
    """Zeros pytree from a ``jax.eval_shape`` result."""
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shape_tree
    )
