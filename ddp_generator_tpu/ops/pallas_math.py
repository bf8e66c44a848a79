"""Mosaic-safe math substitutions for tracing user problem functions inside
Pallas TPU kernels.

Pallas' TPU lowering supports the core transcendentals (sin, cos, exp, log,
sqrt, tanh...) but not the inverse-trig family (``asin``, ``acos``, ``atan``,
``atan2`` raise ``NotImplementedError: Unimplemented primitive ... asin``).
User dynamics are arbitrary JAX code (e.g. the CarParking heading update uses
``arcsin``, ``optDefCar.mac:7``), so kernel paths trace user functions through
:func:`pallas_safe`, which evaluates their jaxpr with unsupported primitives
replaced by polynomial implementations built from supported ones.

Accuracy: the ``asin`` core uses the Abramowitz & Stegun 4.4.46 7th-order
minimax form, |error| <= 2e-8 over [-1, 1] -- below float32 resolution (the
TPU kernel dtype).  The XLA (non-kernel) paths keep the exact primitives.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.extend import core as jex_core

_HALF_PI = 1.5707963267948966

# A&S 4.4.46 coefficients: asin(x) = pi/2 - sqrt(1-x) * poly(x), 0 <= x <= 1.
_ASIN_COEFFS = (
    1.5707963050,
    -0.2145988016,
    0.0889789874,
    -0.0501743046,
    0.0308918810,
    -0.0170881256,
    0.0066700901,
    -0.0012624911,
)


def asin(x):
    a = jnp.abs(x)
    poly = jnp.zeros_like(a) + _ASIN_COEFFS[-1]
    for c in reversed(_ASIN_COEFFS[:-1]):
        poly = poly * a + c
    r = _HALF_PI - jnp.sqrt(jnp.maximum(1.0 - a, 0.0)) * poly
    return jnp.sign(x) * r


def acos(x):
    return _HALF_PI - asin(x)


def atan(x):
    # atan(x) = asin(x / sqrt(1 + x^2)); rsqrt is supported.
    return asin(x * jax.lax.rsqrt(1.0 + x * x))


def atan2(y, x):
    r = jnp.sqrt(x * x + y * y)
    safe = r > 0.0
    core = asin(jnp.where(safe, y / jnp.where(safe, r, 1.0), 0.0))
    sgn_y = jnp.where(y >= 0.0, 1.0, -1.0)
    out = jnp.where(x >= 0.0, core, sgn_y * (2.0 * _HALF_PI) - core)
    return jnp.where(safe, out, jnp.zeros_like(core))


_SUBSTITUTIONS = {
    "asin": asin,
    "acos": acos,
    "atan": atan,
    "atan2": atan2,
}

# Higher-order primitives to recurse through transparently ("jit" is the
# pjit primitive's name in current jax).
_CALL_PRIMS = ("jit", "pjit", "custom_jvp_call", "custom_vjp_call",
               "custom_jvp_call_jaxpr", "closed_call", "core_call")


def _eval_jaxpr(jaxpr, consts, *args):
    env = {}

    def read(v):
        if isinstance(v, jex_core.Literal):
            return v.val
        return env[v]

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, consts):
        write(v, c)
    for v, a in zip(jaxpr.invars, args):
        write(v, a)

    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        name = eqn.primitive.name
        if name in _SUBSTITUTIONS:
            out = _SUBSTITUTIONS[name](*invals)
            outvals = [out]
        elif name in _CALL_PRIMS:
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if hasattr(inner, "jaxpr"):  # ClosedJaxpr
                outvals = _eval_jaxpr(inner.jaxpr, inner.consts, *invals)
            else:
                outvals = _eval_jaxpr(inner, (), *invals)
        else:
            out = eqn.primitive.bind(*invals, **eqn.params)
            outvals = out if eqn.primitive.multiple_results else [out]
        for v, val in zip(eqn.outvars, outvals):
            write(v, val)
    return [read(v) for v in jaxpr.outvars]


def pallas_safe(fn: Callable) -> Callable:
    """Wrap ``fn`` so unsupported primitives are replaced when traced.

    The wrapped function traces ``fn`` to a jaxpr at its actual argument
    shapes, then re-evaluates it with the substitution table -- safe to call
    inside a Pallas kernel body.
    """

    def wrapped(*args):
        flat, in_tree = jax.tree_util.tree_flatten(args)

        def flat_fn(*fa):
            return fn(*jax.tree_util.tree_unflatten(in_tree, fa))

        closed, out_shape = jax.make_jaxpr(flat_fn, return_shape=True)(*flat)
        outs = _eval_jaxpr(closed.jaxpr, closed.consts, *flat)
        out_tree = jax.tree_util.tree_structure(out_shape)
        return jax.tree_util.tree_unflatten(out_tree, outs)

    return wrapped
