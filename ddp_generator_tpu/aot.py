"""Ahead-of-time build: compile a solver once, ship it as an artifact.

TPU-native counterpart of the reference's offline build pipeline
(``make_iLQG.m:43-96``): there, Maxima codegen + ``mex`` compile produce a
binary ``iLQG<Problem>.<mexext>`` that later sessions load without
regenerating; here, :func:`export_solver` lowers and serializes the fully
jitted solver (StableHLO via ``jax.export``) and :func:`load_solver` restores
a callable without re-tracing or re-differentiating the problem.  Like the
reference's artifact, the exported solver is specialized to the problem, the
options, and the array shapes/dtypes (``N_X``/``N_U`` baked into
``iLQG_problem.h``, ``iLQG_mex.c:39-43`` dim checks) -- except that the batch
size may be left *symbolic* so one artifact serves any instance count.

The incremental-build behavior of ``make_iLQG.m:30-37`` (skip generation when
the output is newer than the problem file) maps to :func:`save_solver`'s
``force`` flag plus the on-disk artifact timestamp.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport

from .options import SolverOptions
from .problem import Problem
from .solution import Solution
from .solver import make_solver

# Solution/NamedTuple pytrees must be registered for jax.export
# serialization; registration is idempotent-guarded by _REGISTERED.
_REGISTERED = False


def _ensure_registered() -> None:
    global _REGISTERED
    if _REGISTERED:
        return
    jexport.register_namedtuple_serialization(
        Solution, serialized_name="ddp_generator_tpu.Solution"
    )
    _REGISTERED = True


def _arg_specs(
    problem: Problem,
    horizon: int,
    params: Any,
    dtype,
    batch: Optional[int | str],
):
    """ShapeDtypeStructs for (x0, u0, params); ``batch`` adds a leading axis,
    and the string ``"B"`` (or any symbolic-dim expression) makes it symbolic.
    """
    dtype = jnp.dtype(dtype)
    x0 = jax.ShapeDtypeStruct((problem.n_x,), dtype)
    u0 = jax.ShapeDtypeStruct((horizon, problem.n_u), dtype)

    def param_spec(v):
        a = jnp.asarray(v)
        d = dtype if jnp.issubdtype(a.dtype, jnp.floating) else a.dtype
        return jax.ShapeDtypeStruct(a.shape, d)

    p_spec = jax.tree_util.tree_map(param_spec, params)
    if batch is None:
        return x0, u0, p_spec
    if isinstance(batch, str):
        (b,) = jexport.symbolic_shape(batch)
    else:
        b = int(batch)
    add = lambda s: jax.ShapeDtypeStruct((b,) + s.shape, s.dtype)
    return add(x0), add(u0), p_spec


def export_solver(
    problem: Problem,
    options: SolverOptions,
    horizon: int,
    params: Any,
    batch: Optional[int | str] = None,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Lower + serialize a solver for ``(x0, u0, params)`` of fixed shapes.

    * ``params``: example pytree (only shapes/dtypes are used) -- plays the
      role of the reference's ``paramdesc[]`` table (``iLQG_mex.c:70-84``).
    * ``batch``: None for a single-instance solver; an int for a fixed batch;
      a symbolic-dim string like ``"B"`` for any batch size.
    * ``platforms``: lowering platforms, e.g. ``("tpu", "cpu")``; defaults to
      the current default backend.
    """
    _ensure_registered()
    uses_pallas = (
        options.backpass_method in ("pallas", "fused")
        or options.linesearch_method == "pallas"
    )
    if uses_pallas and isinstance(batch, str):
        # Mosaic kernels have static shapes: the lane-padded (C, B) blocks
        # cannot be lowered with a symbolic batch dim.  Same tradeoff as the
        # reference baking N_X/N_U into the artifact (iLQG_problem.h) --
        # one exported artifact per batch size.
        raise ValueError(
            "Pallas-kernel solvers cannot be exported with a symbolic "
            "batch dim; pass a fixed integer batch"
        )
    fn = make_solver(problem, options)
    if batch is not None:
        fn = jax.jit(jax.vmap(fn, in_axes=(0, 0, None)))
    specs = _arg_specs(problem, horizon, params, options.dtype, batch)
    # Mosaic kernels lower to the "tpu_custom_call" custom call, which
    # jax.export rejects by default as not-stability-guaranteed; the bench
    # artifact is rebuilt per jax version (save_solver force flag), so the
    # in-version escape hatch is the right trade.
    disabled = ()
    plats = tuple(platforms) if platforms else (jax.default_backend(),)
    if uses_pallas and any(p.lower() == "tpu" for p in plats):
        disabled = (jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),)
    # Export for a non-f64 solver under an x64-disabled scope: with x64 on,
    # jax.export's lowering materializes weak python-float constants inside
    # the Pallas kernels as f64 + an explicit f64->f32 convert, which Mosaic
    # refuses ("Unsupported cast") -- plain jit demotes the same constants
    # silently.  The exported program's dtypes are fully pinned by the arg
    # specs + options.dtype, so the scope changes nothing else.
    import contextlib
    x64_scope = (
        contextlib.nullcontext()
        if jnp.dtype(options.dtype) == jnp.float64
        else jax.enable_x64(False)
    )
    with x64_scope:
        exp = jexport.export(
            fn,
            platforms=tuple(platforms) if platforms else None,
            disabled_checks=list(disabled),
        )(*specs)
    return bytes(exp.serialize())


def load_solver(blob: bytes):
    """Deserialize an exported solver into a jitted callable.

    The restored function enforces the baked shapes/dtypes exactly like the
    MEX dim checks (``iLQG_mex.c:39-43``); no tracing of the original problem
    happens (the problem's Python functions need not even be importable).
    """
    _ensure_registered()
    exp = jexport.deserialize(blob)
    return jax.jit(exp.call)


def save_solver(path: str, *args, force: bool = False, **kwargs) -> bool:
    """Export to ``path`` unless a fresh artifact already exists.

    Mirrors ``make_iLQG(problem, switches, force_gen)``'s incremental rebuild
    (``make_iLQG.m:30-37``).  Returns True when a new artifact was written.
    """
    if not force and os.path.exists(path) and os.path.getsize(path) > 0:
        return False
    blob = export_solver(*args, **kwargs)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(blob)
    os.replace(tmp, path)
    return True


def load_solver_file(path: str):
    with open(path, "rb") as fh:
        return load_solver(fh.read())
