"""Component-major derivative bundle emission + fused-layout backward pass.

This is the production derivs->backpass path for batched TPU solves.  Round
2 measured the Pallas backward pass at ~3.5 ms of which a large share was
the ADAPTER: ``calc_derivs`` materializes a batch-major ``(B, N, ...)``
bundle (~0.8 GB at B=2048, N=500, f32) which ``batched_back_pass_pallas``
then transposes to the kernel's component-major ``(N, C, B)`` layout -- a
full extra read+write of the largest array in the solver.

Here the bundle is *born* component-major and packed:

* the small inputs (``xs``/``us``/multipliers, ~16 MB) are transposed to
  ``(N, comp, B)`` first;
* the per-step derivative objects are computed on ``(comp, B)`` lane
  vectors by :func:`pallas_fused.step_derivative_components` (basis-vector
  ``jax.linearize`` -- the same machinery the fused kernel runs in-VMEM,
  executed here as plain XLA ops, replacing the generated ``calc_derivs``
  of the reference, ``iLQG_func.tem:187-221``), vmapped over the horizon
  with the batch axis minor throughout, so XLA writes each per-component
  ``(N, B)`` column directly; the kernel's ``(C, N, B)`` component-OUTER
  arrays are then leading-axis stacks of those columns -- the one
  concatenation XLA lowers copy-free (a middle-axis stack
  double-materializes the whole bundle through windowed DUS fusions);
* symmetric components (cxx, cuu and the trailing axes of fxx/fuu) are
  emitted packed (upper triangle): 194 -> 159 per-step f32 components for
  the CarParking/FULL_DDP workload, ~18% less HBM bundle traffic (the
  packed-triangle idea of the reference's ``matMult.h:8-9``).

Scope mirrors the other batched kernels: shared (unbatched) params.  The
solver falls back to ``calc_derivs`` + the transposing adapter for
per-lane-params batches.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..problem import Problem
from .backpass import BackPassResult
from .pallas_backpass import pallas_back_pass_cm, pack_sym_components

Array = jax.Array


class _RawFns:
    """Duck-typed ``pallas_fused._Safes`` exposing the problem functions
    unwrapped: outside Mosaic, XLA supports the full transcendental set, so
    no substitution layer is needed and values match ``calc_derivs``."""

    def __init__(self, problem: Problem):
        self.f = problem.f
        self.L = problem.L
        self.F = problem.F
        self.h = [bc.fn for bc in problem.box_constraints]
        self.hle = list(problem.hle)
        self.hli = list(problem.hli)
        self.hfe = list(problem.hfe)
        self.hfi = list(problem.hfi)


def batched_calc_derivs_cm(
    problem: Problem,
    xs: Array,  # (B, N+1, n_x) batch-major nominal trajectory
    us: Array,  # (B, N, n_u)
    params: Any,  # shared (unbatched) pytree
    mu_le: Array,  # (B, N, n_hle)
    mu_li: Array,
    mu_fe: Array,  # (B, n_hfe)
    mu_fi: Array,
    w_pen_l: Array,  # (B,)
    w_pen_f: Array,
    full_ddp: bool,
    shared_primal: bool = False,
):
    """Batched ``calc_derivs`` with packed component-major output.

    Returns ``(sd_cm dict of component-OUTER (C, N, B) arrays keyed like
    StepDerivs, final_cx (n_x, B), final_cxx (n_x*n_x, B) full,
    ok (B,) bool)`` -- the exact input layout of
    :func:`pallas_backpass.pallas_back_pass_cm`.

    ``shared_primal`` selects the single-primal-trace emitter
    (:func:`pallas_fused.step_derivative_components_shared`); the default
    per-family emitter is the v5e-measured winner by 12x -- see the
    ``SolverOptions.derivs_emitter`` note.
    """
    from .pallas_fused import (
        final_derivative_components,
        step_derivative_components,
        step_derivative_components_shared,
    )

    step_components = (
        step_derivative_components_shared if shared_primal
        else step_derivative_components
    )

    B, Np1, n_x = xs.shape
    N = Np1 - 1
    n_u = us.shape[-1]
    dtype = us.dtype
    np_dtype = np.dtype(dtype.name)
    raw = _RawFns(problem)

    to_cm = lambda a: jnp.transpose(a.reshape(B, N, -1), (1, 2, 0))
    x_cm = to_cm(xs[:, :N])  # (N, n_x, B)
    u_cm = to_cm(us)
    mle_cm = to_cm(mu_le) if problem.n_hle else jnp.zeros((N, 0, B), dtype)
    mli_cm = to_cm(mu_li) if problem.n_hli else jnp.zeros((N, 0, B), dtype)
    xF_cm = jnp.transpose(xs[:, N], (1, 0))  # (n_x, B)
    mfe_rows = [mu_fe[:, i] for i in range(problem.n_hfe)]
    mfi_rows = [mu_fi[:, i] for i in range(problem.n_hfi)]

    def flat2(rows2):  # nested [a][b] of (B,) -> flat row-major list
        return [v for row in rows2 for v in row]

    def step_k(k, x_arr, u_arr, mle, mli):
        # Returns a dict of flat component LISTS of (B,) lane vectors (plus
        # the ok flag).  After vmap over k each component is an (N, B)
        # column; the caller stacks those on a NEW LEADING axis to build
        # the kernel's (C, N, B) arrays copy-free.
        mu_le_rows = [mle[i] for i in range(problem.n_hle)]
        mu_li_rows = [mli[i] for i in range(problem.n_hli)]
        (fx, fu, cx, cu, cxx, cuu, cxu, fxx, fuu, fxu,
         lower, upper, lo_hx, up_hx, lo_s, up_s, dok) = (
            step_components(
                problem, raw, x_arr, u_arr, params, k, mu_le_rows,
                mu_li_rows, w_pen_l, full_ddp, np_dtype,
            )
        )
        out = {
            "fx": flat2(fx),
            "fu": flat2(fu),
            "cx": list(cx),
            "cu": list(cu),
            "cxx": pack_sym_components([v for r in cxx for v in r], n_x),
            "cuu": pack_sym_components([v for r in cuu for v in r], n_u),
            "cxu": flat2(cxu),
            "lower": list(lower),
            "upper": list(upper),
            "lower_hx": flat2(lo_hx),
            "upper_hx": flat2(up_hx),
            "lower_sign": list(lo_s),
            "upper_sign": list(up_s),
        }
        if full_ddp:
            out["fxx"] = [
                v
                for i_ in range(n_x)
                for v in pack_sym_components(
                    [fxx[i_][a][b] for a in range(n_x) for b in range(n_x)],
                    n_x,
                )
            ]
            out["fuu"] = [
                v
                for i_ in range(n_x)
                for v in pack_sym_components(
                    [fuu[i_][a][b] for a in range(n_u) for b in range(n_u)],
                    n_u,
                )
            ]
            out["fxu"] = [
                fxu[i_][a][b] for i_ in range(n_x) for a in range(n_x)
                for b in range(n_u)
            ]
        else:
            out["fxx"] = out["fuu"] = out["fxu"] = []
        return out, dok

    ks = jnp.arange(N)
    cols, dok_steps = jax.vmap(step_k)(ks, x_cm, u_cm, mle_cm, mli_cm)
    # Leading-axis stack of per-component (N, B) columns -> (C, N, B).
    sd_cm = {
        key: (jnp.stack(v, axis=0) if v else jnp.zeros((0, N, B), dtype))
        for key, v in cols.items()
    }

    Fx, Fxx, okf = final_derivative_components(
        problem, raw, xF_cm, params, N, mfe_rows, mfi_rows, w_pen_f, np_dtype
    )
    final_cx = jnp.stack(Fx, 0)  # (n_x, B)
    final_cxx = jnp.stack(
        [Fxx[a][b] for a in range(n_x) for b in range(n_x)], 0
    )  # full (n_x*n_x, B): the kernel seeds Vxx from it once per solve

    ok = (jnp.min(dok_steps, axis=0) * okf) > 0.5  # (B,) bool
    return sd_cm, final_cx, final_cxx, ok


def cm_emit(
    problem: Problem,
    xs: Array,  # (B, N+1, n_x)
    us: Array,  # (B, N, n_u)
    mu_le: Array,
    mu_li: Array,
    mu_fe: Array,
    mu_fi: Array,
    w_pen_l: Array,  # (B,) derivative-time penalty weights
    w_pen_f: Array,
    params: Any,  # shared pytree
    full_ddp: bool,
    shared_primal: bool = False,
):
    """Lane-pad to the TPU tile width and emit the packed CM bundle.

    Returns ``(sd_cm dict, final_cx, final_cxx, us_cm, ok (B,) unpadded,
    pad)`` -- the emission half of :func:`cm_derivs_back_pass`, split out
    so a lambda-escalation retry can re-run ONLY the kernel on the frozen
    bundle (the reference's inner while, ``iLQG.c:261-284``, never
    recomputes derivatives between retries)."""
    B = xs.shape[0]
    pad = (-B) % 128
    if pad:
        padb = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], axis=0
        )
        xs, us, mu_le, mu_li, mu_fe, mu_fi, w_pen_l, w_pen_f = (
            padb(a) for a in (xs, us, mu_le, mu_li, mu_fe, mu_fi,
                              w_pen_l, w_pen_f)
        )
    sd_cm, final_cx, final_cxx, ok = batched_calc_derivs_cm(
        problem, xs, us, params, mu_le, mu_li, mu_fe, mu_fi,
        w_pen_l, w_pen_f, full_ddp, shared_primal=shared_primal,
    )
    us_cm = jnp.transpose(us, (2, 1, 0))  # (n_u, N, B) component-outer
    if pad:
        ok = ok[:B]
    return sd_cm, final_cx, final_cxx, us_cm, ok, pad


def cm_back_pass_from_bundle(
    sd_cm,  # dict of component-outer (C, N, Bp) arrays
    final_cx: Array,
    final_cxx: Array,
    us_cm: Array,  # (n_u, N, Bp)
    lam: Array,  # (B,) UNPADDED
    n_x: int,
    reg_type: int,
    full_ddp: bool,
    pad: int,
    interpret: bool = False,
) -> BackPassResult:
    """Kernel half of :func:`cm_derivs_back_pass`: run the Pallas backward
    pass on an already-emitted (padded) bundle and return the batch-major
    unpadded result."""
    from ..derivs import StepDerivs

    n_u, N, Bp = us_cm.shape
    B = Bp - pad
    if pad:
        lam = jnp.concatenate(
            [lam, jnp.broadcast_to(lam[:1], (pad,))], axis=0
        )
    l_cm, L_cm, dV, g_norm, failed = pallas_back_pass_cm(
        StepDerivs(**sd_cm), final_cx, final_cxx, us_cm, lam[None, :], n_x,
        reg_type=reg_type, full_ddp=full_ddp, interpret=interpret,
    )
    res = BackPassResult(
        l=jnp.transpose(l_cm, (2, 0, 1)),
        L=jnp.transpose(L_cm, (2, 0, 1)).reshape(Bp, N, n_u, n_x),
        dV=jnp.transpose(dV, (1, 0)),
        g_norm=g_norm[0],
        failed=failed[0],
    )
    if pad:
        res = jax.tree_util.tree_map(lambda a: a[:B], res)
    return res


def cm_derivs_back_pass(
    problem: Problem,
    xs: Array,  # (B, N+1, n_x)
    us: Array,  # (B, N, n_u)
    mu_le: Array,
    mu_li: Array,
    mu_fe: Array,
    mu_fi: Array,
    w_pen_l: Array,  # (B,) derivative-time penalty weights
    w_pen_f: Array,
    lam: Array,  # (B,)
    params: Any,  # shared pytree
    reg_type: int,
    full_ddp: bool,
    interpret: bool = False,
):
    """Batched derivatives (XLA, packed CM emission) + Pallas backward pass.

    Returns ``(BackPassResult batch-major, derivs_ok (B,) bool)`` --
    semantics of ``calc_derivs`` + ``back_pass`` per lane (the combined
    step 1+2 of ``iLQG.c:241-284``)."""
    sd_cm, final_cx, final_cxx, us_cm, ok, pad = cm_emit(
        problem, xs, us, mu_le, mu_li, mu_fe, mu_fi, w_pen_l, w_pen_f,
        params, full_ddp,
    )
    res = cm_back_pass_from_bundle(
        sd_cm, final_cx, final_cxx, us_cm, lam, problem.n_x,
        reg_type, full_ddp, pad, interpret=interpret,
    )
    return res, ok
