"""Pallas TPU kernels: the multi-alpha line search as two fused rollouts.

The line search is the hot op left after the fused backward pass: 8 alphas x
N serial steps of tiny VPU math (the dynamics transcendentals dominate).  The
XLA ``vmap``-of-``scan`` version pays per-step region overhead and strided
(B, N, ...) slicing; these kernels run each whole rollout inside ONE
``pallas_call`` with the same design as ``pallas_backpass``:

* grid = (N,), forward order; VMEM scratch carries the state/cost/ok flags
  across grid steps (TPU grid iterations execute sequentially);
* component-major layout ``(N, C, B)``: tiny state/control components on
  sublanes, the instance batch on the 128-wide lanes;
* user problem functions (f, L, F, h, hle, hli, hfe, hfi) are traced INSIDE
  the kernel on component-indexed vectors -- ``x[0]`` is an ``(A, B)`` or
  ``(B,)`` lane vector -- through :func:`pallas_math.pallas_safe`, which
  substitutes Mosaic-unsupported transcendentals (asin & co).

Two kernels implement ``line_search`` semantics (``line_search.c:33-78``)
exactly, split so the 8-wide sweep never materializes trajectories:

1. **cost sweep** (multi-alpha): rolls all alphas simultaneously, emitting
   only per-alpha total costs and finite-ness flags -- no (N, A, n_x, B)
   trajectory traffic;
2. after the (cheap, XLA) first-accepted-alpha selection, the **selected
   rollout** re-rolls exactly one alpha per lane (a per-lane alpha vector)
   and stores its trajectory.  Recomputation is bit-identical to the sweep
   (same op order), so the returned cost/trajectory pair is consistent.

Scope: shared (unbatched) params; per-lane params fall back to the XLA path
in the solver.  Failure lanes report the LAST alpha's numbers like the
reference (``line_search.c:70-76``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..al import _eq_penalty, _ineq_penalty
from ..problem import Problem
from .linesearch import LineSearchResult
from .pallas_math import pallas_safe

Array = jax.Array


def _normalize_leaf(a: Array) -> Array:
    """Param leaf -> 2D array for a VMEM ref."""
    a = jnp.asarray(a)
    if a.ndim == 0:
        return a.reshape(1, 1)
    if a.ndim == 1:
        return a.reshape(1, -1)
    return a.reshape(a.shape[0], -1)


def _read_leaf(ref, shape: tuple, dtype) -> Array:
    if len(shape) == 0:
        return ref[0, 0]
    if len(shape) == 1:
        return ref[0, :]
    return ref[...].reshape(shape)


def _make_rollout_kernel(
    problem: Problem,
    N: int,
    alphas: Sequence[float],  # static schedule (multi) -- ignored if not multi
    leaf_shapes: Sequence[tuple],
    np_dtype,
    multi: bool,
    treedef,
    want_cost: bool = False,  # non-multi only: also emit total cost + ok
    S: int = 1,  # time steps per grid iteration (see pallas_backpass)
):
    n_x, n_u = problem.n_x, problem.n_u
    n_hle, n_hli = problem.n_hle, problem.n_hli
    n_hfe, n_hfi = problem.n_hfe, problem.n_hfi
    A = len(alphas)

    f_safe = pallas_safe(problem.f)
    L_safe = pallas_safe(problem.L)
    F_safe = pallas_safe(problem.F)
    h_safe = [pallas_safe(bc.fn) for bc in problem.box_constraints]
    hle_safe = [pallas_safe(fn) for fn in problem.hle]
    hli_safe = [pallas_safe(fn) for fn in problem.hli]
    hfe_safe = [pallas_safe(fn) for fn in problem.hfe]
    hfi_safe = [pallas_safe(fn) for fn in problem.hfi]

    def kernel(*refs):
        it = iter(refs)
        xnom_ref, unom_ref, l_ref, L_ref = (next(it) for _ in range(4))
        mu_le_ref = next(it) if n_hle else None
        mu_li_ref = next(it) if n_hli else None
        x0_ref, wpl_ref, wpf_ref = (next(it) for _ in range(3))
        mu_fe_ref = next(it) if n_hfe else None
        mu_fi_ref = next(it) if n_hfi else None
        alpha_ref = None if multi else next(it)
        param_refs = [next(it) for _ in leaf_shapes]
        if multi:
            costs_ref, ok_ref = next(it), next(it)
            xs_ref = xf_ref = us_ref = None
        else:
            xs_ref, xf_ref, us_ref = next(it), next(it), next(it)
            costs_ref = next(it) if want_cost else None
            ok_ref = next(it) if want_cost else None
        x_s, c_s, ok_s = next(it), next(it), next(it)

        # grid = (batch_tiles, time_blocks); time is innermost so the VMEM
        # rollout state is re-initialized once per batch tile (batch tiling
        # exists for large B: whole-B blocks blow the scoped-VMEM limit at
        # B >= 16384 -- measured 19.3 MB vs the 16 MB cap).
        i = pl.program_id(1)
        wpl = wpl_ref[0, :]  # (B,)
        wpf = wpf_ref[0, :]

        leaves = [
            _read_leaf(r, s, np_dtype) for r, s in zip(param_refs, leaf_shapes)
        ]
        p = jax.tree_util.tree_unflatten(treedef, leaves)

        @pl.when(i == 0)
        def _init():
            if multi:
                for a in range(n_x):
                    row = x0_ref[a, :]  # (B,)
                    x_s[a * A:(a + 1) * A, :] = jnp.broadcast_to(
                        row[None, :], (A,) + row.shape
                    )
            else:
                x_s[...] = x0_ref[...]
            c_s[...] = jnp.zeros_like(c_s)
            ok_s[...] = jnp.ones_like(ok_s)

        if multi:
            x_list = [x_s[a * A:(a + 1) * A, :] for a in range(n_x)]  # (A,B)
            # Build the per-row alpha column from iota (Pallas forbids
            # captured array constants; scalar constants are fine).
            ai = jax.lax.broadcasted_iota(jnp.int32, (A, 1), 0)
            alpha = jnp.zeros((A, 1), np_dtype)
            for a_i, a_v in enumerate(alphas):
                alpha = alpha + float(a_v) * (ai == a_i).astype(np_dtype)
        else:
            x_list = [x_s[a, :] for a in range(n_x)]  # (B,)
            alpha = alpha_ref[0, :]  # (B,)

        if multi:
            c_acc = c_s[...]
            ok_acc = ok_s[...]
        else:
            c_acc = c_s[0, :]
            ok_acc = ok_s[0, :]

        for sj in range(S):
            k = i * S + sj  # global time step (user fns index params by it)
            xn = [xnom_ref[sj, a, :] for a in range(n_x)]  # (B,)
            dx = [x_list[a] - xn[a] for a in range(n_x)]

            u_list = []
            for j in range(n_u):
                du = alpha * l_ref[sj, j, :]
                for a in range(n_x):
                    du = du + L_ref[sj, j * n_x + a, :] * dx[a]
                u_list.append(unom_ref[sj, j, :] + du)
            if any(float(al) == 0.0 for al in alphas):
                # alpha == 0 selects the reference's exact open-loop branch
                # (iLQG_func.tem:155-158)
                zmask = (alpha == 0.0).astype(np_dtype)
                u_list = [
                    u_list[j] + zmask * (unom_ref[sj, j, :] - u_list[j])
                    for j in range(n_u)
                ]

            x_arr = jnp.stack(x_list)
            u_arr0 = jnp.stack(u_list)
            # clampU semantics: sequential per-constraint clamping
            # (iLQG_func.tem:68-73); the limit is u-independent by the
            # single-input +-1-coefficient rule
            # (genenerator_main.mac:385-395).
            for bc, hs in zip(problem.box_constraints, h_safe):
                hval = hs(x_arr, u_arr0, p, k)
                lim = -bc.sign * (hval - bc.sign * u_arr0[bc.u_index])
                cur = u_list[bc.u_index]
                u_list[bc.u_index] = (
                    jnp.minimum(cur, lim) if bc.sign > 0
                    else jnp.maximum(cur, lim)
                )
            u_arr = jnp.stack(u_list)

            # running cost with AL penalties, vector-shaped (no global sum)
            c = L_safe(x_arr, u_arr, p, k)
            for idx, fn in enumerate(hle_safe):
                hval = fn(x_arr, u_arr, p, k)
                c = c + _eq_penalty(mu_le_ref[sj, idx, :], hval, wpl)
            for idx, fn in enumerate(hli_safe):
                hval = fn(x_arr, u_arr, p, k)
                c = c + _ineq_penalty(mu_li_ref[sj, idx, :], hval, wpl)

            x_next = f_safe(x_arr, u_arr, p, k)

            okf = jnp.isfinite(c).astype(np_dtype)
            for a in range(n_x):
                okf = okf * jnp.isfinite(x_next[a]).astype(np_dtype)

            if not multi:
                for a in range(n_x):
                    xs_ref[sj, a, :] = x_list[a]
                for j in range(n_u):
                    us_ref[sj, j, :] = u_list[j]

            # accumulate (in registers; scratch flushed once per block)
            c_acc = c_acc + c
            ok_acc = ok_acc * okf
            x_list = list(x_next)

        if multi:
            c_s[...] = c_acc
            ok_s[...] = ok_acc
            for a in range(n_x):
                x_s[a * A:(a + 1) * A, :] = x_list[a]
        else:
            c_s[0, :] = c_acc
            ok_s[0, :] = ok_acc
            for a in range(n_x):
                x_s[a, :] = x_list[a]

        @pl.when(i == (N // S) - 1)
        def _fin():
            if multi or want_cost:
                cf = F_safe(x_next, p, N)
                for idx, fn in enumerate(hfe_safe):
                    hval = fn(x_next, p, N)
                    cf = cf + _eq_penalty(mu_fe_ref[idx, :], hval, wpf)
                for idx, fn in enumerate(hfi_safe):
                    hval = fn(x_next, p, N)
                    cf = cf + _ineq_penalty(mu_fi_ref[idx, :], hval, wpf)
                costs_ref[...] = c_s[...] + cf
                ok_ref[...] = ok_s[...] * jnp.isfinite(cf).astype(np_dtype)
            if not multi:
                for a in range(n_x):
                    xf_ref[a, :] = x_next[a]

    return kernel


def _whole_spec(a: Array):
    """Entire array resident (param leaves -- no batch axis)."""
    nd = a.ndim
    return pl.BlockSpec(a.shape, lambda bt, i: (i - i,) * nd,
                        memory_space=pltpu.VMEM)


def _fixed_spec(a: Array, BT: int):
    """(c, B) batch-minor fixed input, batch-tiled."""
    return pl.BlockSpec((a.shape[0], BT), lambda bt, i: (i - i, bt),
                        memory_space=pltpu.VMEM)


def _step_spec(a: Array, S: int, BT: int):
    """(N, c, B) per-step input: (S, c, BT) block at (time, 0, batch)."""
    return pl.BlockSpec((S, a.shape[1], BT), lambda bt, i: (i, i - i, bt),
                        memory_space=pltpu.VMEM)


def _pick_rollout_blocks(N: int, B: int, step_comps: int, out_step: int,
                         out_fixed: int, scratch_comps: int, itemsize: int,
                         vmem_budget: int = 8 * 2 ** 20):
    """(S, BT) for the rollout kernels: largest batch tile whose working
    set fits the scoped-VMEM budget, then the largest legal time block.
    BT == B keeps today's whole-batch behavior for bench-sized batches.

    The block-spec estimate below cannot see Mosaic's STACK temporaries
    (the rollout body materializes many per-lane vector intermediates,
    all scaling with BT): measured scoped usage at B=16384 was 16.37 MB
    against a ~7 MB block estimate.  BT is therefore hard-capped at 4096
    lanes -- a 4x margin below the measured blow-up, with per-grid-step
    cost still far above the ~4 us fixed floor."""
    from .pallas_backpass import _pick_time_block

    def est(S, BT):
        return (2 * S * (step_comps + out_step) + out_fixed
                + scratch_comps) * BT * itemsize

    # Candidate tiles must divide B AND be 128-lane-aligned (Mosaic: block
    # minor dims must be (8,128)-divisible or equal to the array dim) --
    # halving alone misses legal tiles and can produce ILLEGAL ones for
    # B = 128*odd (e.g. B=4480 halves to 2240 = 17.5 tiles).
    if B % 128 == 0:
        m = B // 128
        cands = sorted((128 * d for d in range(1, m + 1) if m % d == 0),
                       reverse=True)
    else:
        cands = [B]  # small/unpadded batches run whole
    BT = next((bt for bt in cands
               if bt <= 4096 and est(1, bt) <= vmem_budget), cands[-1])
    S = _pick_time_block(N, step_comps + out_step, BT, itemsize)
    while S > 1 and est(S, BT) > vmem_budget:
        S = max(s for s in range(1, S) if N % s == 0)
    return S, BT


def rollout_call(
    problem: Problem,
    alphas: tuple,
    xnom_cm, unom_cm, l_cm, L_cm, mu_le_cm, mu_li_cm,
    x0_cm, w_pen_l, w_pen_f, mu_fe_cm, mu_fi_cm, alpha_vec,
    params: Any,
    multi: bool,
    interpret: bool = False,
    want_cost: bool = False,
    time_block: int | None = None,
    batch_tile: int | None = None,
):
    """Invoke one rollout kernel (multi-alpha cost sweep or selected rollout).

    All array args are component-major (see module docstring).
    ``batch_tile`` overrides the auto batch tile (tests / A-B levers)."""
    N, n_x, B = xnom_cm.shape
    n_u = unom_cm.shape[1]
    dtype = xnom_cm.dtype
    np_dtype = np.dtype(dtype.name)
    A = len(alphas)

    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaf_shapes = tuple(tuple(jnp.shape(x)) for x in leaves)
    norm_leaves = [_normalize_leaf(x).astype(dtype) for x in leaves]

    step_inputs = [xnom_cm, unom_cm, l_cm, L_cm]
    if problem.n_hle:
        step_inputs.append(mu_le_cm)
    if problem.n_hli:
        step_inputs.append(mu_li_cm)

    # Time-block the grid (see pallas_backpass._pick_time_block): the
    # per-step rollout math is far below the fixed per-grid-step cost, so
    # S=1 runs at ~4 us/step regardless of work (measured: the 8-alpha
    # sweep and a single rollout both took ~2.0 ms at N=500).  Large B
    # additionally tiles the batch axis to stay under the scoped-VMEM cap.
    step_comps = sum(a.shape[1] for a in step_inputs)
    out_step = (n_x + n_u) if not multi else 0
    out_fixed = 2 * A if multi else (n_x + (2 if want_cost else 0))
    scratch_comps = (n_x * A + 2 * A) if multi else (n_x + 2)
    if interpret:
        S, BT = (2 if N % 2 == 0 else 1), B
    else:
        S, BT = _pick_rollout_blocks(
            N, B, step_comps, out_step, out_fixed, scratch_comps,
            jnp.dtype(dtype).itemsize,
        )
    if time_block is not None:
        S = time_block
        if N % S:
            raise ValueError(f"time_block {S} must divide N={N}")
    if batch_tile is not None:
        if B % batch_tile:
            raise ValueError(f"batch_tile {batch_tile} must divide B={B}")
        BT = batch_tile

    kernel = _make_rollout_kernel(
        problem, N, alphas, leaf_shapes, np_dtype, multi, treedef,
        want_cost=want_cost, S=S,
    )
    fixed_inputs = [x0_cm, w_pen_l, w_pen_f]
    if problem.n_hfe:
        fixed_inputs.append(mu_fe_cm)
    if problem.n_hfi:
        fixed_inputs.append(mu_fi_cm)
    if not multi:
        fixed_inputs.append(alpha_vec)

    in_specs = [_step_spec(a, S, BT) for a in step_inputs]
    in_specs += [_fixed_spec(a, BT) for a in fixed_inputs]
    in_specs += [_whole_spec(a) for a in norm_leaves]
    fixed_inputs += norm_leaves

    if multi:
        out_shape = [
            jax.ShapeDtypeStruct((A, B), dtype),  # costs
            jax.ShapeDtypeStruct((A, B), dtype),  # ok (0/1)
        ]
        fix2 = lambda bt, i: (i - i, bt)
        out_specs = [
            pl.BlockSpec((A, BT), fix2, memory_space=pltpu.VMEM),
            pl.BlockSpec((A, BT), fix2, memory_space=pltpu.VMEM),
        ]
        scratch = [
            pltpu.VMEM((n_x * A, BT), dtype),
            pltpu.VMEM((A, BT), dtype),
            pltpu.VMEM((A, BT), dtype),
        ]
    else:
        fwd2 = lambda bt, i: (i, i - i, bt)
        fix2 = lambda bt, i: (i - i, bt)
        out_shape = [
            jax.ShapeDtypeStruct((N, n_x, B), dtype),  # xs steps
            jax.ShapeDtypeStruct((n_x, B), dtype),  # x final
            jax.ShapeDtypeStruct((N, n_u, B), dtype),  # us
        ]
        out_specs = [
            pl.BlockSpec((S, n_x, BT), fwd2, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_x, BT), fix2, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, n_u, BT), fwd2, memory_space=pltpu.VMEM),
        ]
        if want_cost:
            out_shape += [
                jax.ShapeDtypeStruct((1, B), dtype),  # total cost
                jax.ShapeDtypeStruct((1, B), dtype),  # ok (0/1)
            ]
            out_specs += [
                pl.BlockSpec((1, BT), fix2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BT), fix2, memory_space=pltpu.VMEM),
            ]
        scratch = [
            pltpu.VMEM((n_x, BT), dtype),
            pltpu.VMEM((1, BT), dtype),
            pltpu.VMEM((1, BT), dtype),
        ]

    return pl.pallas_call(
        kernel,
        grid=(B // BT, N // S),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*step_inputs, *fixed_inputs)


def _to_cm(a: Array) -> Array:
    """(B, N, d...) -> (N, prod(d), B)."""
    B, N = a.shape[:2]
    return jnp.transpose(a.reshape(B, N, -1), (1, 2, 0))


class _LSCtx:
    """Padded component-major operands shared by the line-search kernels."""

    def __init__(self, problem, x0, xs_nom, us_nom, l, L_gain, dV, cost,
                 mu_le, mu_li, mu_fe, mu_fi, w_pen_l, w_pen_f):
        B, Np1, n_x = xs_nom.shape
        self.B, self.N, self.n_x = B, Np1 - 1, n_x
        self.n_u = us_nom.shape[-1]
        self.dtype = us_nom.dtype
        pad = self.pad = (-B) % 128
        if pad:
            padb = lambda a: jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], axis=0
            )
            (x0, xs_nom, us_nom, l, L_gain, dV, cost, mu_le, mu_li, mu_fe,
             mu_fi, w_pen_l, w_pen_f) = (
                padb(a) for a in (x0, xs_nom, us_nom, l, L_gain, dV, cost,
                                  mu_le, mu_li, mu_fe, mu_fi,
                                  w_pen_l, w_pen_f)
            )
        self.Bp = B + pad
        N = self.N
        self.xnom_cm = _to_cm(xs_nom[:, :N])
        self.unom_cm = _to_cm(us_nom)
        self.l_cm = _to_cm(l)
        self.L_cm = _to_cm(L_gain)
        self.mu_le_cm = _to_cm(mu_le) if problem.n_hle else None
        self.mu_li_cm = _to_cm(mu_li) if problem.n_hli else None
        self.x0_cm = jnp.transpose(x0, (1, 0))
        self.mu_fe_cm = jnp.transpose(mu_fe, (1, 0)) if problem.n_hfe else None
        self.mu_fi_cm = jnp.transpose(mu_fi, (1, 0)) if problem.n_hfi else None
        self.wpl = w_pen_l[None, :]
        self.wpf = w_pen_f[None, :]
        self.dV = dV
        self.cost = cost
        # Padded batch-major nominals: the staged search's all-dead fast
        # path returns them untouched (no rollout at all).
        self.xs_nom_p = xs_nom
        self.us_nom_p = us_nom

    def call(self, problem, alphas, params, alpha_vec, multi, interpret,
             want_cost=False, time_block=None, batch_tile=None):
        return rollout_call(
            problem, alphas, self.xnom_cm, self.unom_cm, self.l_cm,
            self.L_cm, self.mu_le_cm, self.mu_li_cm, self.x0_cm, self.wpl,
            self.wpf, self.mu_fe_cm, self.mu_fi_cm, alpha_vec, params,
            multi=multi, interpret=interpret, want_cost=want_cost,
            time_block=time_block, batch_tile=batch_tile,
        )


def _select_first_accept(alphas, costs, okf, ctx, z_min):
    """Masked first-accepted-alpha selection (line_search.c:41-54 under
    vmap).  Returns (idx, any_ok, dcost, expected, z, al (A,1))."""
    A = len(alphas)
    al = jnp.asarray(np.asarray(alphas, np.dtype(ctx.dtype.name)))[:, None]
    dcost = ctx.cost[None, :] - costs
    expected = -al * (ctx.dV[:, 0][None, :] + al * ctx.dV[:, 1][None, :])
    z = jnp.where(
        expected > 0.0, dcost / jnp.where(expected > 0.0, expected, 1.0), 0.0
    )
    accepted = (okf > 0.5) & (z > z_min)
    idx_first = jnp.argmax(accepted, axis=0)  # (Bp,)
    any_ok = jnp.any(accepted, axis=0)
    idx = jnp.where(any_ok, idx_first, A - 1)
    return idx, any_ok, dcost, expected, z, al


def _traj_out(xs_cm, xf_cm, us_cm):
    xs_full = jnp.concatenate([xs_cm, xf_cm[None]], axis=0)  # (N+1, n_x, Bp)
    return jnp.transpose(xs_full, (2, 0, 1)), jnp.transpose(us_cm, (2, 0, 1))


def pallas_line_search(
    problem: Problem,
    alphas: tuple,  # static float schedule
    x0: Array,  # (B, n_x)
    xs_nom: Array,  # (B, N+1, n_x)
    us_nom: Array,  # (B, N, n_u)
    l: Array,  # (B, N, n_u)
    L_gain: Array,  # (B, N, n_u, n_x)
    dV: Array,  # (B, 2)
    cost: Array,  # (B,)
    z_min: float,
    params: Any,  # shared (unbatched) pytree
    mu_le: Array,  # (B, N, n_hle)
    mu_li: Array,
    mu_fe: Array,  # (B, n_hfe)
    mu_fi: Array,
    w_pen_l: Array,  # (B,)
    w_pen_f: Array,
    interpret: bool = False,
    time_block: int | None = None,
    batch_tile: int | None = None,
) -> LineSearchResult:
    """Batched line search via the two fused rollout kernels.

    Semantics identical to :func:`ops.linesearch.line_search` under vmap
    (first-accepted-alpha; last-alpha numbers on total failure)."""
    A = len(alphas)
    ctx = _LSCtx(problem, x0, xs_nom, us_nom, l, L_gain, dV, cost,
                 mu_le, mu_li, mu_fe, mu_fi, w_pen_l, w_pen_f)
    B, Bp = ctx.B, ctx.Bp

    costs, okf = ctx.call(problem, alphas, params, None, multi=True,
                          interpret=interpret, time_block=time_block,
                          batch_tile=batch_tile)  # (A, Bp) each
    idx, any_ok, dcost, expected, z, al = _select_first_accept(
        alphas, costs, okf, ctx, z_min
    )
    take = lambda m: jnp.take_along_axis(m, idx[None, :], axis=0)[0]
    alpha_vec = take(jnp.broadcast_to(al, (A, Bp)))

    xs_cm, xf_cm, us_cm = ctx.call(
        problem, alphas, params, alpha_vec[None, :], multi=False,
        interpret=interpret, time_block=time_block,
        batch_tile=batch_tile,
    )
    xs_out, us_out = _traj_out(xs_cm, xf_cm, us_cm)

    res = LineSearchResult(
        success=any_ok,
        xs=xs_out,
        us=us_out,
        new_cost=take(costs),
        dcost=take(dcost),
        expected=take(expected),
        z=take(z),
        alpha_index=jnp.where(any_ok, idx, jnp.asarray(A, jnp.int32)).astype(
            jnp.int32
        ),
    )
    if ctx.pad:
        res = jax.tree_util.tree_map(lambda a: a[:B], res)
    return res


def pallas_line_search_staged(
    problem: Problem,
    alphas: tuple,
    x0: Array,
    xs_nom: Array,
    us_nom: Array,
    l: Array,
    L_gain: Array,
    dV: Array,
    cost: Array,
    z_min: float,
    params: Any,
    mu_le: Array,
    mu_li: Array,
    mu_fe: Array,
    mu_fi: Array,
    w_pen_l: Array,
    w_pen_f: Array,
    alive: Array | None = None,  # (B,) bool: lanes whose result matters
    interpret: bool = False,
) -> LineSearchResult:
    """Line search with an alpha[0] fast path.

    The reference's serial schedule tries alpha=1 first and accepts it on
    most iterations near convergence (``line_search.c:33-45``); the 8-wide
    sweep pays for all 8 rollouts every time.  Stage 1 rolls ONLY alpha[0]
    (with trajectory + cost); iff some *live* lane rejects it, the full
    sweep + selected-rollout pair runs under ``lax.cond``.  Inside the full
    path the selected rollout is itself skipped when every accepting lane
    accepted alpha[0] (the stage-1 trajectory is bit-identical: same kernel,
    same alpha).

    ``alive`` masks lanes whose line-search result is consumed by the
    solver this iteration; converged-but-still-carried lanes (done, or out
    of iteration budget) would otherwise reject alpha[0] forever (their
    expected improvement is ~0) and pin the slow path.  Per live lane the
    result is identical with or without staging; dead lanes get
    different-but-masked garbage.
    """
    A = len(alphas)
    ctx = _LSCtx(problem, x0, xs_nom, us_nom, l, L_gain, dV, cost,
                 mu_le, mu_li, mu_fe, mu_fi, w_pen_l, w_pen_f)
    B, Bp = ctx.B, ctx.Bp
    dtype = ctx.dtype

    if alive is None:
        alive_p = jnp.ones((Bp,), bool)
    else:
        alive_p = jnp.concatenate(
            [alive, jnp.zeros((ctx.pad,), bool)], axis=0
        ) if ctx.pad else alive

    def live_path(_):
        # ---- stage 1: alpha[0] only, with trajectory and total cost ----
        a0 = float(alphas[0])
        alpha0_vec = jnp.full((1, Bp), a0, dtype)
        xs0, xf0, us0, cost0, ok0 = ctx.call(
            problem, alphas, params, alpha0_vec, multi=False,
            interpret=interpret, want_cost=True,
        )
        cost0, ok0 = cost0[0], ok0[0]
        dcost0 = ctx.cost - cost0
        expected0 = -a0 * (ctx.dV[:, 0] + a0 * ctx.dV[:, 1])
        z0 = jnp.where(
            expected0 > 0.0,
            dcost0 / jnp.where(expected0 > 0.0, expected0, 1.0),
            0.0,
        )
        acc0 = (ok0 > 0.5) & (z0 > z_min)
        need_sweep = jnp.any(alive_p & ~acc0)

        def quick_path(_):
            xs_out, us_out = _traj_out(xs0, xf0, us0)
            return LineSearchResult(
                success=acc0,
                xs=xs_out,
                us=us_out,
                new_cost=cost0,
                dcost=dcost0,
                expected=expected0,
                z=z0,
                alpha_index=jnp.where(acc0, 0, A).astype(jnp.int32),
            )

        def full_path(_):
            costs, okf = ctx.call(problem, alphas, params, None, multi=True,
                                  interpret=interpret)
            idx, any_ok, dcost, expected, z, al = _select_first_accept(
                alphas, costs, okf, ctx, z_min
            )
            take = lambda m: jnp.take_along_axis(m, idx[None, :], axis=0)[0]
            alpha_vec = take(jnp.broadcast_to(al, (A, Bp)))
            need_sel = jnp.any(alive_p & any_ok & (idx > 0))
            xs_cm, xf_cm, us_cm = jax.lax.cond(
                need_sel,
                lambda __: tuple(ctx.call(
                    problem, alphas, params, alpha_vec[None, :], multi=False,
                    interpret=interpret,
                )),
                lambda __: (xs0, xf0, us0),
                None,
            )
            xs_out, us_out = _traj_out(xs_cm, xf_cm, us_cm)
            return LineSearchResult(
                success=any_ok,
                xs=xs_out,
                us=us_out,
                new_cost=take(costs),
                dcost=take(dcost),
                expected=take(expected),
                z=take(z),
                alpha_index=jnp.where(
                    any_ok, idx, jnp.asarray(A, jnp.int32)
                ).astype(jnp.int32),
            )

        return jax.lax.cond(need_sweep, full_path, quick_path, None)

    def dead_path(_):
        # No live lane consumes this search (e.g. a body call where every
        # active lane is in a lambda-escalation retry): skip BOTH rollout
        # kernels.  Per-lane masking in the solver discards everything
        # below; the nominal pass-through keeps the shapes/dtypes.
        zeros = jnp.zeros((Bp,), dtype)
        return LineSearchResult(
            success=jnp.zeros((Bp,), bool),
            xs=ctx.xs_nom_p,
            us=ctx.us_nom_p,
            new_cost=ctx.cost,
            dcost=zeros,
            expected=zeros,
            z=zeros,
            alpha_index=jnp.full((Bp,), A, jnp.int32),
        )

    res = jax.lax.cond(jnp.any(alive_p), live_path, dead_path, None)
    if ctx.pad:
        res = jax.tree_util.tree_map(lambda a: a[:B], res)
    return res
