"""Device-mesh scaling: shard a batch of problem instances over chips/hosts.

The reference is a single-process, shared-memory program with no distributed
communication of any kind (SURVEY.md section 2 parallelism table); its unit of
work is ONE (x0, u_nom) per process (``iLQG_mex.c:19-144``).  The TPU-native
scaling model is:

* **data parallelism**: ``vmap`` the whole masked solver over an instance
  batch, shard the batch axis over a 1-D ``jax.sharding.Mesh`` -- XLA
  partitions the computation SPMD across chips, riding ICI within a host and
  DCN across hosts with no custom transport;
* **cross-device reductions**: convergence statistics aggregate with mesh
  collectives (``psum``-lowered ``jnp.sum`` under sharding constraints);
* **multi-host**: ``jax.distributed.initialize`` + the same mesh spanning all
  processes.

Tensor/model parallelism is not meaningful per instance (N_X=4, N_U=2 for the
car; matrices are tiny -- ``iLQG_problem.tem:16-17``); per-chip parallelism
comes from batching the small matrices across the vector units.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..options import SolverOptions
from ..problem import Problem
from ..solution import Solution
from ..solver import make_solver

Array = jax.Array

BATCH_AXIS = "batch"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = BATCH_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices, batch-sharding axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


class BatchStats(NamedTuple):
    """Aggregate convergence statistics (mesh-collective reductions)."""

    n_success: Array
    n_instances: Array
    mean_cost: Array
    mean_iterations: Array
    max_g_norm: Array


def batch_stats(sol: Solution) -> BatchStats:
    n = sol.cost.shape[0]
    succ = sol.success.astype(jnp.int32)
    return BatchStats(
        n_success=jnp.sum(succ),
        n_instances=jnp.asarray(n, jnp.int32),
        mean_cost=jnp.mean(sol.cost),
        mean_iterations=jnp.mean(sol.iterations.astype(sol.cost.dtype)),
        max_g_norm=jnp.max(sol.g_norm),
    )


def make_sharded_solver(
    problem: Problem,
    options: SolverOptions = SolverOptions(),
    mesh: Optional[Mesh] = None,
    batch_params: bool = False,
    axis: str = BATCH_AXIS,
):
    """Batched solver with the instance axis sharded over the mesh.

    Returns a jitted ``(x0s, u0s, params) -> (Solution, BatchStats)`` where
    ``x0s`` is (B, n_x), ``u0s`` is (B, N, n_u) and B must be divisible by the
    mesh size.  The per-instance Solution comes back batch-sharded (no gather
    unless the caller reads it); the BatchStats are fully reduced across the
    mesh (lowered to ``psum``-style collectives by XLA).
    """
    if mesh is None:
        mesh = make_mesh(axis=axis)
    base = make_solver(problem, options)
    batched = jax.vmap(base, in_axes=(0, 0, 0 if batch_params else None))

    shard = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    param_sharding = shard if batch_params else replicated

    def fn(x0s, u0s, params):
        x0s = jax.lax.with_sharding_constraint(x0s, shard)
        u0s = jax.lax.with_sharding_constraint(u0s, shard)
        # Batched params are sharded along the instance axis with the batch;
        # shared params are replicated on every device.
        params = jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(
                jnp.asarray(a), param_sharding
            ),
            params,
        )
        sol = batched(x0s, u0s, params)
        return sol, batch_stats(sol)

    return jax.jit(fn)


def multihost_initialize(**kwargs) -> None:
    """Multi-host entry: ``jax.distributed.initialize`` passthrough.

    On a pod slice each host runs the same program; ``make_mesh`` then spans
    all processes' devices and the sharded solver needs no further changes
    (SURVEY.md section 5, distributed-communication row).
    """
    jax.distributed.initialize(**kwargs)
