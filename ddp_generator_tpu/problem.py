"""Problem specification for the TPU-native DDP/iLQG framework.

The reference (jgeisler0303/DDP-Generator) defines optimal-control problems in
the Maxima language (reference ``README.md:23-38``): states ``x``, inputs ``u``,
dynamics ``f``, running cost ``L``, final cost ``F``, input constraints ``h``,
general constraints ``hle/hli/hfe/hfi``, auxiliary variables and free-symbol
parameters.  A symbolic generator (``genenerator_main.mac``) validates the
problem and emits problem-specific C.

Here the same capability is a plain Python dataclass of traced JAX functions:

* ``f(x, u, p, k) -> x_next``       (dynamics; reference ``f[...]`` arrays)
* ``L(x, u, p, k) -> scalar``       (running cost)
* ``F(x, p, k) -> scalar``          (final cost; ``k`` is passed as ``n_hor``
  so ``[k]``-indexed, time-varying parameters work at the final stage exactly
  as in the reference, cf. ``iLQG_func.tem:52`` ``const int k= o->n_hor``)
* ``h``: list of ``(x, u, p, k) -> scalar`` input-box constraints ``h_i < 0``
* ``hle/hli``: running equality / inequality constraints ``(x, u, p, k)``
* ``hfe/hfi``: final equality / inequality constraints ``(x, p, k)``

"Auxiliary variables" of the reference (``gen_dep_graph.mac``) are ordinary
local variables inside these functions -- XLA common-subexpression elimination
replaces the reference's dependency-graph/CSE machinery.  Free-symbol
parameters are entries of the ``params`` pytree (a dict of scalars / arrays /
``[k]``-indexed time-varying arrays indexed inside the user functions).

Input-constraint analysis mirrors the generator's validation
(``genenerator_main.mac:373-397``): every ``h_i`` may depend on exactly one
input, with a constant coefficient of +1 or -1.  That lets ``h_i(x,u) < 0`` be
re-arranged into a state-dependent lower or upper bound on a single input,
which is what the generated ``clampU`` / ``limitsU`` code does
(``iLQG_func.tem:68-119``).
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
DynamicsFn = Callable[..., Array]  # f(x, u, p, k) -> x_next
RunningCostFn = Callable[..., Array]  # L(x, u, p, k) -> scalar
FinalCostFn = Callable[..., Array]  # F(x, p, k) -> scalar
ConstraintFn = Callable[..., Array]  # h(x, u, p, k) -> scalar
FinalConstraintFn = Callable[..., Array]  # h(x, p, k) -> scalar


class ProblemValidationError(ValueError):
    """Raised when a problem definition violates the reference's rules.

    Mirrors the fail-fast generator-side validation of
    ``genenerator_main.mac:1-27,385-395`` and ``gen_dep_graph.mac:59-61``.
    """


@dataclasses.dataclass(frozen=True)
class BoxConstraint:
    """Analyzed input constraint ``h_i(x, u) < 0``.

    The reference generator proves symbolically that ``h_i`` depends on exactly
    one input ``u[idx]`` with coefficient ``sign`` in {+1, -1}
    (``genenerator_main.mac:385-395``).  Then

        ``h_i = sign * u[idx] + rest(x, p, k) < 0``

    is an upper bound on ``u[idx]`` when ``sign > 0`` and a lower bound when
    ``sign < 0``.  ``limit(x, p, k) = -sign * (h_i - sign * u[idx])`` evaluated
    at any ``u`` gives the bound value (``genenerator_main.mac:399-437``).
    """

    fn: ConstraintFn
    u_index: int
    sign: float  # +1.0 => upper bound on u[u_index]; -1.0 => lower bound


@dataclasses.dataclass(frozen=True)
class Problem:
    """An optimal-control problem in the reference's capability set.

    Equivalent of a reference ``.mac`` problem file after generator analysis.
    """

    n_x: int
    n_u: int
    f: DynamicsFn
    L: RunningCostFn
    F: FinalCostFn
    h: tuple[ConstraintFn, ...] = ()
    hle: tuple[ConstraintFn, ...] = ()
    hli: tuple[ConstraintFn, ...] = ()
    hfe: tuple[FinalConstraintFn, ...] = ()
    hfi: tuple[FinalConstraintFn, ...] = ()
    name: str = "problem"
    # Optional user-output function g(x, u, p, k) -> (n_g,) evaluated along
    # trajectories (reference calcG/get_g_size, iLQG_func.tem:511-521).
    g: Optional[Callable] = None
    # Filled by analysis (tuple of BoxConstraint, same order as h).
    box_constraints: tuple[BoxConstraint, ...] = ()

    @property
    def n_h(self) -> int:
        return len(self.h)

    @property
    def n_hle(self) -> int:
        return len(self.hle)

    @property
    def n_hli(self) -> int:
        return len(self.hli)

    @property
    def n_hfe(self) -> int:
        return len(self.hfe)

    @property
    def n_hfi(self) -> int:
        return len(self.hfi)


def _example_args(problem_nx: int, problem_nu: int, params: Any, rng: np.random.Generator):
    x = jnp.asarray(rng.normal(size=(problem_nx,)))
    u = jnp.asarray(rng.normal(size=(problem_nu,)))
    k = jnp.asarray(0, dtype=jnp.int32)
    return x, u, params, k


def analyze_box_constraints(
    n_x: int,
    n_u: int,
    h: Sequence[ConstraintFn],
    params: Any,
    n_probe: int = 3,
    seed: int = 0,
) -> tuple[BoxConstraint, ...]:
    """Validate and classify the input constraints ``h``.

    Numerical counterpart of the symbolic checks at
    ``genenerator_main.mac:385-395``: for each ``h_i`` the Jacobian w.r.t.
    ``u`` must be one-hot with value +-1, constant in ``(x, u)`` (probed at
    several random points).
    """
    rng = np.random.default_rng(seed)
    # Probing is host-side setup: pin it to a CPU device when one is
    # registered so it never round-trips through a (remote) TPU backend.
    try:
        device_ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
    except RuntimeError:
        device_ctx = contextlib.nullcontext()
    out = []
    with device_ctx:
        return _analyze_on_device(n_x, n_u, h, params, n_probe, rng)


def _analyze_on_device(n_x, n_u, h, params, n_probe, rng):
    out = []
    for ci, fn in enumerate(h):
        # All probe points in ONE jitted call: eager per-point autodiff would
        # dispatch hundreds of tiny ops, which is pathologically slow on
        # remote-compile TPU backends (host round-trip per op).
        xs = jnp.asarray(rng.normal(size=(n_probe, n_x)))
        us = jnp.asarray(rng.normal(size=(n_probe, n_u)))
        k = jnp.asarray(0, dtype=jnp.int32)

        def gu_fn(x, u, fn=fn):
            return jax.grad(lambda u_: fn(x, u_, params, k))(u)

        gus = np.asarray(jax.jit(jax.vmap(gu_fn))(xs, us), dtype=np.float64)
        grads = list(gus)
        g0 = grads[0]
        for g in grads[1:]:
            if not np.allclose(g, g0, atol=1e-9, rtol=1e-9):
                raise ProblemValidationError(
                    f"constraint h[{ci}] must depend linearly on a single input "
                    f"with constant coefficient (got varying du-gradient {g} vs {g0}); "
                    "cf. genenerator_main.mac:385-395"
                )
        nz = np.nonzero(np.abs(g0) > 1e-12)[0]
        if len(nz) != 1:
            raise ProblemValidationError(
                f"constraint h[{ci}] may depend on exactly one input, found "
                f"du-gradient {g0}; cf. genenerator_main.mac:390-391"
            )
        idx = int(nz[0])
        sign = float(g0[idx])
        if not np.isclose(abs(sign), 1.0, atol=1e-9):
            raise ProblemValidationError(
                f"coefficient of input in constraint h[{ci}] must be +1 or -1, "
                f"found {sign}; cf. genenerator_main.mac:393-394"
            )
        out.append(BoxConstraint(fn=fn, u_index=idx, sign=float(np.sign(sign))))
    return tuple(out)


def _validate_shapes(problem: Problem, params: Any) -> None:
    """Shape/fail-fast validation mirroring ``genenerator_main.mac:1-27``."""
    rng = np.random.default_rng(1)
    x, u, p, k = _example_args(problem.n_x, problem.n_u, params, rng)
    fx = jax.eval_shape(problem.f, x, u, p, k)
    if fx.shape != (problem.n_x,):
        raise ProblemValidationError(
            f"f must map to {problem.n_x} states (elements of f indexed by x, "
            f"genenerator_main.mac:16-17); got shape {fx.shape}"
        )
    for nm, fn, args in (
        ("L", problem.L, (x, u, p, k)),
        ("F", problem.F, (x, p, k)),
    ):
        s = jax.eval_shape(fn, *args)
        if s.shape != ():
            raise ProblemValidationError(
                f"{nm} must be a scalar, not a list (genenerator_main.mac:19-27); "
                f"got shape {s.shape}"
            )
    for family, fns, args in (
        ("h", problem.h, (x, u, p, k)),
        ("hle", problem.hle, (x, u, p, k)),
        ("hli", problem.hli, (x, u, p, k)),
        ("hfe", problem.hfe, (x, p, k)),
        ("hfi", problem.hfi, (x, p, k)),
    ):
        for i, fn in enumerate(fns):
            s = jax.eval_shape(fn, *args)
            if s.shape != ():
                raise ProblemValidationError(
                    f"{family}[{i}] must be scalar; got shape {s.shape}"
                )
    # F / hfe / hfi cannot depend on u by construction (their signature has no
    # u argument) -- the structural equivalent of genenerator_main.mac:48-49,
    # 69-70, 128-129.


def make_problem(
    n_x: int,
    n_u: int,
    f: DynamicsFn,
    L: RunningCostFn,
    F: FinalCostFn,
    h: Sequence[ConstraintFn] = (),
    hle: Sequence[ConstraintFn] = (),
    hli: Sequence[ConstraintFn] = (),
    hfe: Sequence[FinalConstraintFn] = (),
    hfi: Sequence[FinalConstraintFn] = (),
    name: str = "problem",
    example_params: Any = None,
    validate: bool = True,
    box_meta: Optional[Sequence[tuple[int, float]]] = None,
    g: Optional[Callable] = None,
) -> Problem:
    """Build and validate a :class:`Problem`.

    ``example_params`` is a params pytree used only for tracing during
    validation and box-constraint analysis (values irrelevant, shapes matter
    for ``[k]``-indexed arrays; any horizon-sized arrays should be non-empty).

    ``box_meta``: optional pre-declared ``(u_index, sign)`` per ``h``
    constraint.  When given, the numeric probing of
    :func:`analyze_box_constraints` is skipped -- useful to keep problem
    construction entirely device-free (probing runs tiny autodiff programs,
    which is slow on remote-compiled TPU backends).  The declared metadata is
    trusted; it corresponds to what the reference generator proves
    symbolically (``genenerator_main.mac:385-395``).
    """
    problem = Problem(
        n_x=n_x,
        n_u=n_u,
        f=f,
        L=L,
        F=F,
        h=tuple(h),
        hle=tuple(hle),
        hli=tuple(hli),
        hfe=tuple(hfe),
        hfi=tuple(hfi),
        name=name,
        g=g,
    )
    if validate:
        _validate_shapes(problem, example_params)
    if box_meta is not None:
        if len(box_meta) != len(problem.h):
            raise ProblemValidationError(
                f"box_meta has {len(box_meta)} entries for {len(problem.h)} "
                "h constraints"
            )
        box = tuple(
            BoxConstraint(fn=fn, u_index=int(idx), sign=float(sign))
            for fn, (idx, sign) in zip(problem.h, box_meta)
        )
    else:
        box = analyze_box_constraints(n_x, n_u, problem.h, example_params)
    return dataclasses.replace(problem, box_constraints=box)


def constraint_limit(bc: BoxConstraint, x: Array, u: Array, p: Any, k: Array) -> Array:
    """State-dependent bound value for one analyzed constraint.

    ``limit = -sign * (h - sign*u[idx])`` -- cf. ``do_limits`` / ``do_clamp``,
    ``genenerator_main.mac:399-437``.  Independent of ``u[idx]`` by linearity.
    """
    hval = bc.fn(x, u, p, k)
    rest = hval - bc.sign * u[bc.u_index]
    return -bc.sign * rest


def clamp_u(problem: Problem, x: Array, u: Array, p: Any, k: Array) -> Array:
    """Apply the generated ``clampU`` semantics (``iLQG_func.tem:68-73``).

    Constraints are enforced sequentially in ascending index order, each
    clamping its single input against its state-dependent limit.
    """
    for bc in problem.box_constraints:
        lim = constraint_limit(bc, x, u, p, k)
        ui = u[bc.u_index]
        new = jnp.where(bc.sign > 0, jnp.minimum(ui, lim), jnp.maximum(ui, lim))
        u = u.at[bc.u_index].set(new)
    return u


def limits_u(
    problem: Problem, x: Array, u: Array, p: Any, k: Array
) -> tuple[Array, Array, Array, Array, Array, Array]:
    """Extract per-input box bounds relative to the current ``u``.

    Counterpart of the generated ``limitsU`` (``iLQG_func.tem:75-119``):

    Returns ``(lower, upper, lower_hx, upper_hx, lower_sign, upper_sign)``:

    * ``lower/upper``: (n_u,) bounds on ``du`` (already shifted by ``-u``,
      cf. ``iLQG_func.tem:91-94``) -- ``-inf``/``+inf`` when unconstrained.
    * ``lower_hx/upper_hx``: (n_u, n_x) gradient d h/dx of the binding
      constraint for each input (zero rows when unconstrained).
    * ``lower_sign/upper_sign``: (n_u,) the +-1 input coefficient of the
      binding constraint (0 when unconstrained), cf. ``do_hx``
      (``genenerator_main.mac:439-447``).
    """
    dtype = u.dtype
    n_u, n_x = problem.n_u, problem.n_x
    lower = jnp.full((n_u,), -jnp.inf, dtype)
    upper = jnp.full((n_u,), jnp.inf, dtype)
    lower_hx = jnp.zeros((n_u, n_x), dtype)
    upper_hx = jnp.zeros((n_u, n_x), dtype)
    lower_sign = jnp.zeros((n_u,), dtype)
    upper_sign = jnp.zeros((n_u,), dtype)

    for bc in problem.box_constraints:
        lim = constraint_limit(bc, x, u, p, k)
        hx = jax.grad(lambda x_, u_=u, p_=p, k_=k: bc.fn(x_, u_, p_, k_))(x)
        j = bc.u_index
        if bc.sign > 0:
            tighter = lim < upper[j]
            upper = upper.at[j].set(jnp.where(tighter, lim, upper[j]))
            upper_hx = upper_hx.at[j].set(jnp.where(tighter, hx, upper_hx[j]))
            upper_sign = upper_sign.at[j].set(
                jnp.where(tighter, jnp.asarray(bc.sign, dtype), upper_sign[j])
            )
        else:
            tighter = lim > lower[j]
            lower = lower.at[j].set(jnp.where(tighter, lim, lower[j]))
            lower_hx = lower_hx.at[j].set(jnp.where(tighter, hx, lower_hx[j]))
            lower_sign = lower_sign.at[j].set(
                jnp.where(tighter, jnp.asarray(bc.sign, dtype), lower_sign[j])
            )

    # Bounds relative to current u (iLQG_func.tem:91-94).
    lower = lower - u
    upper = upper - u
    return lower, upper, lower_hx, upper_hx, lower_sign, upper_sign
