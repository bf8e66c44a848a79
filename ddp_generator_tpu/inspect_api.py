"""Model-inspection API: every symbolic quantity as a callable.

TPU-native counterpart of the generated ``iLQG<P>MMex`` inspection MEX
(component 12 of SURVEY.md; template ``iLQG_MMex.tem``, driver
``make_iLQG_MMex.mac``): a per-problem function table exposing f, L, F and
all twelve derivative objects individually, plus ``clampU`` in isolation.
The reference exposes them through a mode switch
(``iLQG_MMex.tem:81-226``):

====  ==========  ====================================
mode  name        here
====  ==========  ====================================
0     f           ``ProblemInspector.f(x, u, p, k)``
1     L           ``.L(x, u, p, k)``
2     F           ``.F(x, p, k)``
3     Fx          ``.Fx(x, p, k)``
4     Fxx         ``.Fxx(x, p, k)``
5     Lx          ``.Lx(x, u, p, k)``
6     Lu          ``.Lu(x, u, p, k)``
7     Lxx         ``.Lxx(x, u, p, k)``
8     Luu         ``.Luu(x, u, p, k)``
9     Lxu         ``.Lxu(x, u, p, k)``
10    fx          ``.fx(x, u, p, k)``
11    fu          ``.fu(x, u, p, k)``
12    fxx         ``.fxx(x, u, p, k)``
13    fuu         ``.fuu(x, u, p, k)``
14    fxu         ``.fxu(x, u, p, k)``
15    y           (empty in reference; omitted)
16    clamped u   ``.clamp_u(x, u, p, k)``
====  ==========  ====================================

Like the reference (which folds the AL penalties into L/F *before* MMex
generation), the ``al_*`` variants expose the augmented costs; the plain
``L``/``F`` expose the user's raw costs.  All matrices are full
(non-triangular), as in MMex (``iLQG_MMex.tem:14``).  This is the
derivative-parity / interop test surface: the callables are drop-in
replacements for Tassa-style ``dyn_cst`` functions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import problem as problem_mod
from .al import augmented_F, augmented_L
from .problem import Problem

_MODE_NAMES = {
    0: "f", 1: "L", 2: "F", 3: "Fx", 4: "Fxx", 5: "Lx", 6: "Lu", 7: "Lxx",
    8: "Luu", 9: "Lxu", 10: "fx", 11: "fu", 12: "fxx", 13: "fuu", 14: "fxu",
    16: "clamp_u",
}


class ProblemInspector:
    """Jitted inspection callables for one problem (MMex equivalent)."""

    def __init__(self, problem: Problem):
        self.problem = problem
        pf = problem.f
        pL = problem.L
        pF = problem.F

        self.f = jax.jit(pf)
        self.L = jax.jit(pL)
        self.F = jax.jit(pF)
        self.fx = jax.jit(jax.jacfwd(pf, argnums=0))
        self.fu = jax.jit(jax.jacfwd(pf, argnums=1))
        self.fxx = jax.jit(jax.jacfwd(jax.jacfwd(pf, argnums=0), argnums=0))
        self.fuu = jax.jit(jax.jacfwd(jax.jacfwd(pf, argnums=1), argnums=1))
        self.fxu = jax.jit(jax.jacfwd(jax.jacfwd(pf, argnums=0), argnums=1))
        self.Lx = jax.jit(jax.grad(pL, argnums=0))
        self.Lu = jax.jit(jax.grad(pL, argnums=1))
        self.Lxx = jax.jit(jax.jacfwd(jax.grad(pL, argnums=0), argnums=0))
        self.Luu = jax.jit(jax.jacfwd(jax.grad(pL, argnums=1), argnums=1))
        self.Lxu = jax.jit(jax.jacfwd(jax.grad(pL, argnums=0), argnums=1))
        self.Fx = jax.jit(jax.grad(pF, argnums=0))
        self.Fxx = jax.jit(jax.jacfwd(jax.grad(pF, argnums=0), argnums=0))
        self.clamp_u = jax.jit(functools.partial(problem_mod.clamp_u, problem))
        self.limits_u = jax.jit(functools.partial(problem_mod.limits_u, problem))

        # AL-augmented costs (what the reference's MMex actually contains,
        # since the generator augments L/F before any code generation):
        aL = functools.partial(augmented_L, problem)
        aF = functools.partial(augmented_F, problem)
        self.al_L = jax.jit(aL)
        self.al_F = jax.jit(aF)
        self.al_Lx = jax.jit(jax.grad(aL, argnums=0))
        self.al_Lu = jax.jit(jax.grad(aL, argnums=1))
        self.al_Fx = jax.jit(jax.grad(aF, argnums=0))

    def by_mode(self, mode: int):
        """Callable for an MMex mode number (``iLQG_MMex.tem:81-226``)."""
        try:
            return getattr(self, _MODE_NAMES[mode])
        except KeyError:
            raise ValueError(f"unsupported MMex mode {mode}") from None


def inspect(problem: Problem) -> ProblemInspector:
    return ProblemInspector(problem)
