"""ddp_generator_tpu: a TPU-native DDP/iLQG solver framework.

Brand-new implementation of the capability set of jgeisler0303/DDP-Generator
(control-limited DDP/iLQG, Tassa/Mansard/Todorov ICRA 2014 -- cited at
reference ``iLQG.c:4-9``), designed TPU-first:

* problem definitions are traced JAX functions; ``jacfwd``/``jacrev`` replace
  the reference's Maxima symbolic-differentiation + gentran C codegen;
* the solver core is ``lax.scan`` over the horizon and a fully masked
  ``lax.while_loop`` outer iteration, so the entire solve jits, vmaps over
  instance batches, and shards over a ``jax.sharding.Mesh``;
* the multi-alpha line search evaluates all alphas simultaneously (the
  reference planned but never implemented this; ``README.md:9``).

Quick start::

    import ddp_generator_tpu as ddp
    from ddp_generator_tpu.models import car_parking

    problem = car_parking.car_parking()
    p, x0, u0 = car_parking.default_setup(T=500)
    sol = ddp.solve(problem, x0, u0, p, ddp.SolverOptions(max_iter=200))
"""

from . import aot
from . import debugging
from .al import Multipliers, init_multipliers, update_multipliers
from .inspect_api import ProblemInspector, inspect
from .derivs import DerivBundle, calc_derivs
from .outputs import calc_g, get_g_size, make_output_fn
from .options import DEFAULT_ALPHA, OptionError, SolverOptions, options_from_dict
from .problem import (
    BoxConstraint,
    Problem,
    ProblemValidationError,
    clamp_u,
    limits_u,
    make_problem,
)
from .solution import (
    STATUS_DERIVS_FAILED,
    STATUS_EXIT_LAMBDA_MAX,
    STATUS_INIT_FAILED,
    STATUS_MAX_ITER,
    STATUS_NO_DESCENT,
    STATUS_RUNNING,
    STATUS_SUCCESS_GRADIENT,
    STATUS_SUCCESS_TOLFUN,
    Solution,
)
from .solver import (
    StepwiseSolver,
    make_batched_solver,
    make_solver,
    make_stepwise_solver,
    solve,
)

__version__ = "0.1.0"

__all__ = [
    "BoxConstraint",
    "aot",
    "debugging",
    "DEFAULT_ALPHA",
    "DerivBundle",
    "Multipliers",
    "OptionError",
    "Problem",
    "ProblemValidationError",
    "Solution",
    "SolverOptions",
    "ProblemInspector",
    "calc_derivs",
    "calc_g",
    "clamp_u",
    "get_g_size",
    "init_multipliers",
    "inspect",
    "limits_u",
    "StepwiseSolver",
    "make_batched_solver",
    "make_output_fn",
    "make_problem",
    "make_solver",
    "make_stepwise_solver",
    "options_from_dict",
    "solve",
    "update_multipliers",
]
