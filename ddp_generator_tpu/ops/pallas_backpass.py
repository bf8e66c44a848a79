"""Pallas TPU kernel: the full backward pass as ONE device kernel.

The backward pass is the hot op of the solver (SURVEY.md section 7, build
step 6: "candidate kernels are the backward-pass step (batched tiny GEMMs +
masked Cholesky, batch-tiled to the MXU)").  The XLA scan version executes
each of the N steps as its own region; this kernel instead runs the whole
reverse recursion inside one ``pallas_call``:

* grid = (N,), iterated reverse via the BlockSpec index map (TPU grid
  iterations execute sequentially, so VMEM scratch legally carries
  ``Vx``/``Vxx``/``l``/``dV``/... across steps);
* per-step derivative blocks stream HBM -> VMEM through the implicit
  pallas pipeline (double-buffered by construction);
* the batch dimension B lies along the VPU lanes: every quantity is a
  ``(B,)`` vector and the tiny state/control contractions are unrolled
  Python loops over (n_x, n_u) -- exactly the "per-chip parallelism comes
  from batching small matrices" design of SURVEY.md section 2;
* boxQP is the exact active-set enumeration (see ``boxqp.boxqp_enumerate``)
  with the 3^n_u patterns unrolled branch-free.

Numerics follow ``back_pass.c`` exactly like the scan implementation:
regType 1/2 regularization, clamped-gain assembly through the
state-dependent constraint boundary, UNregularized Quu/Qxu in the value
update, dV accumulation and the ``/(n_hor-1)`` g_norm divisor.

Layout: inputs are time-major ``(N, B, ...)`` so each grid step's block is
a contiguous slab.  ``batched_back_pass`` (bottom) adapts the solver's
batch-major derivative bundle and is used through ``custom_vmap`` so the
per-instance solver code keeps its serial-scan path.
"""

from __future__ import annotations

import functools
import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..derivs import DerivBundle
from .backpass import BackPassResult

Array = jax.Array


def _patterns(n_u: int):
    return sorted(
        itertools.product((0, 1, 2), repeat=n_u),
        key=lambda pat: sum(1 for v in pat if v),
    )


def _sym_solve_small(H, rhs, free, n):
    """Masked free-set solve via closed-form inverse; H, rhs are dicts of
    (B,) vectors: H[(i,j)], rhs[i].  Returns (x dict, pd_ok (B,), inv dict).

    free: tuple of static bools per index (the clamp pattern).
    """
    # Build masked matrix entries: identity on clamped rows/cols.
    def h(i, j):
        if free[i] and free[j]:
            return H[(min(i, j), max(i, j))]
        one = 1.0 if i == j else 0.0
        return jnp.full_like(rhs[0], one)

    if n == 1:
        a = h(0, 0)
        ok = a > 0.0
        det = jnp.where(ok, a, 1.0)
        inv = {(0, 0): 1.0 / det}
    elif n == 2:
        a, b, d = h(0, 0), h(0, 1), h(1, 1)
        det = a * d - b * b
        ok = (a > 0.0) & (det > 0.0)
        sdet = jnp.where(ok, det, 1.0)
        inv = {(0, 0): d / sdet, (0, 1): -b / sdet, (1, 1): a / sdet}
    elif n == 3:
        a, b, c = h(0, 0), h(0, 1), h(0, 2)
        d, e, f = h(1, 1), h(1, 2), h(2, 2)
        m2 = a * d - b * b
        det = a * (d * f - e * e) - b * (b * f - c * e) + c * (b * e - c * d)
        ok = (a > 0.0) & (m2 > 0.0) & (det > 0.0)
        sdet = jnp.where(ok, det, 1.0)
        inv = {
            (0, 0): (d * f - e * e) / sdet,
            (0, 1): (c * e - b * f) / sdet,
            (0, 2): (b * e - c * d) / sdet,
            (1, 1): (a * f - c * c) / sdet,
            (1, 2): (b * c - a * e) / sdet,
            (2, 2): (a * d - b * b) / sdet,
        }
    else:
        raise NotImplementedError("pallas backward pass supports n_u <= 3")

    def iv(i, j):
        v = inv[(min(i, j), max(i, j))]
        # zero outside the free block
        if not (free[i] and free[j]):
            return jnp.zeros_like(v)
        return v

    x = [
        sum(iv(i, j) * rhs[j] for j in range(n)) if free[i] else jnp.zeros_like(rhs[0])
        for i in range(n)
    ]
    return x, ok, iv


def _make_kernel(n_x: int, n_u: int, reg_type: int, full_ddp: bool, N: int):
    pats = _patterns(n_u)
    NX, NU = n_x, n_u

    def kernel(
        # inputs (per-step blocks, shape (1, B, ...)); FULL_DDP tensor refs
        # present only when full_ddp:
        *refs,
    ):
        it = iter(refs)
        fx_ref, fu_ref, cx_ref, cu_ref = next(it), next(it), next(it), next(it)
        cxx_ref, cuu_ref, cxu_ref = next(it), next(it), next(it)
        if full_ddp:
            fxx_ref, fuu_ref, fxu_ref = next(it), next(it), next(it)
        lower_ref, upper_ref = next(it), next(it)
        lo_hx_ref, up_hx_ref = next(it), next(it)
        lo_s_ref, up_s_ref = next(it), next(it)
        u_ref = next(it)
        lam_ref, vx0_ref, vxx0_ref = next(it), next(it), next(it)
        l_ref, L_ref, dv_ref, gnorm_ref, failed_ref = (
            next(it), next(it), next(it), next(it), next(it)
        )
        vx_s, vxx_s, lprev_s, dv_s, g_s, fail_s = (
            next(it), next(it), next(it), next(it), next(it), next(it)
        )

        i = pl.program_id(0)
        is_first = i == 0
        is_last = i == N - 1

        @pl.when(is_first)
        def _init():
            vx_s[...] = vx0_ref[...]
            vxx_s[...] = vxx0_ref[...]
            lprev_s[...] = jnp.zeros_like(lprev_s)
            dv_s[...] = jnp.zeros_like(dv_s)
            g_s[...] = jnp.zeros_like(g_s)
            fail_s[...] = jnp.zeros_like(fail_s)

        lam = lam_ref[...]
        Vx = [vx_s[:, a] for a in range(NX)]
        Vxx = [[vxx_s[:, a, b] for b in range(NX)] for a in range(NX)]

        fx = [[fx_ref[0, :, a, b] for b in range(NX)] for a in range(NX)]
        fu = [[fu_ref[0, :, a, b] for b in range(NU)] for a in range(NX)]
        cx = [cx_ref[0, :, a] for a in range(NX)]
        cu = [cu_ref[0, :, a] for a in range(NU)]
        cxx = [[cxx_ref[0, :, a, b] for b in range(NX)] for a in range(NX)]
        cuu = [[cuu_ref[0, :, a, b] for b in range(NU)] for a in range(NU)]
        cxu = [[cxu_ref[0, :, a, b] for b in range(NU)] for a in range(NX)]

        # Q builds (back_pass.c:80-131)
        # Vxx @ fx and Vxx @ fu
        vfx = [[sum(Vxx[a][i_] * fx[i_][b] for i_ in range(NX)) for b in range(NX)]
               for a in range(NX)]
        vfu = [[sum(Vxx[a][i_] * fu[i_][b] for i_ in range(NX)) for b in range(NU)]
               for a in range(NX)]
        Qu = [cu[a] + sum(fu[i_][a] * Vx[i_] for i_ in range(NX)) for a in range(NU)]
        Qx = [cx[a] + sum(fx[i_][a] * Vx[i_] for i_ in range(NX)) for a in range(NX)]
        Qxu = [[cxu[a][b] + sum(fx[i_][a] * vfu[i_][b] for i_ in range(NX))
                for b in range(NU)] for a in range(NX)]
        Quu = [[cuu[a][b] + sum(fu[i_][a] * vfu[i_][b] for i_ in range(NX))
                for b in range(NU)] for a in range(NU)]
        Qxx = [[cxx[a][b] + sum(fx[i_][a] * vfx[i_][b] for i_ in range(NX))
                for b in range(NX)] for a in range(NX)]
        if full_ddp:
            for a in range(NX):
                for b in range(NU):
                    Qxu[a][b] = Qxu[a][b] + sum(
                        Vx[i_] * fxu_ref[0, :, i_, a, b] for i_ in range(NX)
                    )
            for a in range(NU):
                for b in range(NU):
                    Quu[a][b] = Quu[a][b] + sum(
                        Vx[i_] * fuu_ref[0, :, i_, a, b] for i_ in range(NX)
                    )
            for a in range(NX):
                for b in range(NX):
                    Qxx[a][b] = Qxx[a][b] + sum(
                        Vx[i_] * fxx_ref[0, :, i_, a, b] for i_ in range(NX)
                    )

        # regularization (back_pass.c:133-159)
        if reg_type == 2:
            QuuF = [[Quu[a][b] + lam * sum(fu[i_][a] * fu[i_][b] for i_ in range(NX))
                     for b in range(NU)] for a in range(NU)]
            Qxu_reg = [[Qxu[a][b] + lam * sum(fx[i_][a] * fu[i_][b] for i_ in range(NX))
                        for b in range(NU)] for a in range(NX)]
        else:
            QuuF = [[Quu[a][b] + jnp.where(a == b, lam, jnp.zeros_like(lam))
                     for b in range(NU)] for a in range(NU)]
            Qxu_reg = Qxu

        lower = [lower_ref[0, :, a] for a in range(NU)]
        upper = [upper_ref[0, :, a] for a in range(NU)]
        finite_lo = [jnp.isfinite(lower[a]) for a in range(NU)]
        finite_up = [jnp.isfinite(upper[a]) for a in range(NU)]
        Hd = {(a, b): QuuF[a][b] for a in range(NU) for b in range(a, NU)}

        zeros = jnp.zeros_like(Qu[0])
        # full-H PD gate (boxqp_enumerate)
        _, pd_full, _ = _sym_solve_small(Hd, Qu, tuple([True] * NU), NU)

        best_valid = zeros > 1.0  # False
        best_x = [zeros for _ in range(NU)]
        best_cl_lo = [best_valid for _ in range(NU)]
        best_cl_up = [best_valid for _ in range(NU)]
        best_inv = {(a, b): zeros for a in range(NU) for b in range(NU)}

        for pat in pats:
            free = tuple(v == 0 for v in pat)
            at_lo = tuple(v == 1 for v in pat)
            at_up = tuple(v == 2 for v in pat)
            bound_ok = None
            xc = []
            for a in range(NU):
                if at_lo[a]:
                    ok_a = finite_lo[a]
                    xc.append(jnp.where(ok_a, lower[a], 0.0))
                elif at_up[a]:
                    ok_a = finite_up[a]
                    xc.append(jnp.where(ok_a, upper[a], 0.0))
                else:
                    ok_a = None
                    xc.append(zeros)
                if ok_a is not None:
                    bound_ok = ok_a if bound_ok is None else (bound_ok & ok_a)
            if bound_ok is None:
                bound_ok = zeros == zeros  # all-True vector

            # rhs = -(g + H xc) (full), solve on free block
            Hxc = [
                sum(Hd[(min(a, b), max(a, b))] * xc[b] for b in range(NU))
                for a in range(NU)
            ]
            rhs = [-(Qu[a] + Hxc[a]) for a in range(NU)]
            xf, pd_ok, iv = _sym_solve_small(Hd, rhs, free, NU)
            x = [xf[a] if free[a] else xc[a] for a in range(NU)]
            grad = [
                Qu[a] + sum(Hd[(min(a, b), max(a, b))] * x[b] for b in range(NU))
                for a in range(NU)
            ]
            kkt = bound_ok & pd_ok
            for a in range(NU):
                if free[a]:
                    kkt = kkt & (x[a] >= lower[a]) & (x[a] <= upper[a])
                elif at_lo[a]:
                    kkt = kkt & (grad[a] >= 0.0)
                else:
                    kkt = kkt & (grad[a] <= 0.0)
            valid = kkt
            take = valid & ~best_valid
            for a in range(NU):
                best_x[a] = jnp.where(take, x[a], best_x[a])
                best_cl_lo[a] = jnp.where(take, at_lo[a], best_cl_lo[a])
                best_cl_up[a] = jnp.where(take, at_up[a], best_cl_up[a])
                for b in range(NU):
                    best_inv[(a, b)] = jnp.where(take, iv(a, b), best_inv[(a, b)])
            best_valid = best_valid | valid

        step_failed = ~(best_valid & pd_full)
        l_k = best_x

        # D[j,:] = sign_j * hx_j for clamped j (back_pass.c:193-199)
        D = [[jnp.where(best_cl_lo[a],
                        lo_s_ref[0, :, a] * lo_hx_ref[0, :, a, b],
                        jnp.where(best_cl_up[a],
                                  up_s_ref[0, :, a] * up_hx_ref[0, :, a, b],
                                  zeros))
              for b in range(NX)] for a in range(NU)]

        # L = -invH (Qxu_reg^T - QuuF D) - D
        M = [[Qxu_reg[b][a] - sum(QuuF[a][c] * D[c][b] for c in range(NU))
              for b in range(NX)] for a in range(NU)]  # (NU, NX)
        L_k = [[-sum(best_inv[(a, c)] * M[c][b] for c in range(NU)) - D[a][b]
                for b in range(NX)] for a in range(NU)]

        # dV += [l.Qu, 0.5 l.Quu.l] (back_pass.c:204-215)
        dv0 = sum(l_k[a] * Qu[a] for a in range(NU))
        dv1 = 0.5 * sum(
            l_k[a] * Quu[a][b] * l_k[b] for a in range(NU) for b in range(NU)
        )

        # value update with UNregularized Quu/Qxu (back_pass.c:217-241)
        Quu_l = [sum(Quu[a][b] * l_k[b] for b in range(NU)) for a in range(NU)]
        Vx_new = [
            Qx[a]
            + sum(L_k[c][a] * (Quu_l[c] + Qu[c]) for c in range(NU))
            + sum(Qxu[a][c] * l_k[c] for c in range(NU))
            for a in range(NX)
        ]
        LQuu = [[sum(L_k[c][a] * Quu[c][d] for c in range(NU)) for d in range(NU)]
                for a in range(NX)]
        Vxx_new = [[
            Qxx[a][b]
            + sum(LQuu[a][d] * L_k[d][b] for d in range(NU))
            + sum(L_k[c][a] * Qxu[b][c] for c in range(NU))
            + sum(Qxu[a][c] * L_k[c][b] for c in range(NU))
            for b in range(NX)] for a in range(NX)]
        # symmetrize
        Vxx_new = [[0.5 * (Vxx_new[a][b] + Vxx_new[b][a]) for b in range(NX)]
                   for a in range(NX)]

        # g_norm contribution: max_a |l_a| / (|u_a|+1) (back_pass.c:244-251)
        g_k = jnp.abs(l_k[0]) / (jnp.abs(u_ref[0, :, 0]) + 1.0)
        for a in range(1, NU):
            g_k = jnp.maximum(g_k, jnp.abs(l_k[a]) / (jnp.abs(u_ref[0, :, a]) + 1.0))

        dead = (fail_s[...] > 0.0) | step_failed

        # write per-step outputs (zero once failed, like the scan version)
        for a in range(NU):
            l_ref[0, :, a] = jnp.where(dead, zeros, l_k[a])
            for b in range(NX):
                L_ref[0, :, a, b] = jnp.where(dead, zeros, L_k[a][b])

        # carry updates (freeze after failure)
        keep = lambda new, old: jnp.where(dead, old, new)
        for a in range(NX):
            vx_s[:, a] = keep(Vx_new[a], vx_s[:, a])
            for b in range(NX):
                vxx_s[:, a, b] = keep(Vxx_new[a][b], vxx_s[:, a, b])
        for a in range(NU):
            lprev_s[:, a] = keep(l_k[a], lprev_s[:, a])
        dv_s[:, 0] = keep(dv_s[:, 0] + dv0, dv_s[:, 0])
        dv_s[:, 1] = keep(dv_s[:, 1] + dv1, dv_s[:, 1])
        g_s[...] = keep(g_s[...] + g_k, g_s[...])
        fail_s[...] = jnp.where(dead, jnp.ones_like(fail_s), fail_s[...])

        @pl.when(is_last)
        def _fin():
            dv_ref[...] = dv_s[...]
            gnorm_ref[...] = g_s[...] / float(N - 1)
            failed_ref[...] = fail_s[...]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("reg_type", "full_ddp", "interpret")
)
def pallas_back_pass_tm(
    sd_tm,  # StepDerivs pytree, TIME-MAJOR: each array (N, B, ...)
    final_cx,  # (B, n_x)
    final_cxx,  # (B, n_x, n_x)
    us_tm,  # (N, B, n_u)
    lam,  # (B,)
    reg_type: int,
    full_ddp: bool,
    interpret: bool = False,
):
    N, B, n_u = us_tm.shape
    n_x = final_cx.shape[-1]
    dtype = us_tm.dtype

    kernel = _make_kernel(n_x, n_u, reg_type, full_ddp, N)

    def rev(i):  # reverse-time block index
        return (N - 1 - i, 0, 0)

    def rev2(i):
        return (N - 1 - i, 0, 0, 0)

    def rev3(i):
        return (N - 1 - i, 0, 0, 0, 0)

    def spec(a):
        nd = a.ndim
        im = {3: rev, 4: rev2, 5: rev3}[nd]
        return pl.BlockSpec((1,) + a.shape[1:], im, memory_space=pltpu.VMEM)

    step_inputs = [
        sd_tm.fx, sd_tm.fu, sd_tm.cx, sd_tm.cu, sd_tm.cxx, sd_tm.cuu,
        sd_tm.cxu,
    ]
    if full_ddp:
        step_inputs += [sd_tm.fxx, sd_tm.fuu, sd_tm.fxu]
    step_inputs += [
        sd_tm.lower, sd_tm.upper, sd_tm.lower_hx, sd_tm.upper_hx,
        sd_tm.lower_sign, sd_tm.upper_sign, us_tm,
    ]
    in_specs = [spec(a) for a in step_inputs]
    fixed_inputs = step_inputs
    whole = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    in_specs += [whole(lam), whole(final_cx), whole(final_cxx)]

    out_shape = [
        jax.ShapeDtypeStruct((N, B, n_u), dtype),  # l
        jax.ShapeDtypeStruct((N, B, n_u, n_x), dtype),  # L
        jax.ShapeDtypeStruct((B, 2), dtype),  # dV
        jax.ShapeDtypeStruct((B,), dtype),  # g_norm
        jax.ShapeDtypeStruct((B,), dtype),  # failed (0/1)
    ]
    out_specs = [
        pl.BlockSpec((1, B, n_u), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, n_u, n_x), rev2, memory_space=pltpu.VMEM),
        pl.BlockSpec((B, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((B,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((B, n_x), dtype),
        pltpu.VMEM((B, n_x, n_x), dtype),
        pltpu.VMEM((B, n_u), dtype),
        pltpu.VMEM((B, 2), dtype),
        pltpu.VMEM((B,), dtype),
        pltpu.VMEM((B,), dtype),
    ]
    l_tm, L_tm, dV, g_norm, failed = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*fixed_inputs, lam, final_cx, final_cxx)
    return l_tm, L_tm, dV, g_norm, failed > 0.0


def batched_back_pass_pallas(
    derivs: DerivBundle,  # batch-major: each step array (B, N, ...)
    us: Array,  # (B, N, n_u)
    lam: Array,  # (B,)
    reg_type: int,
    full_ddp: bool,
    interpret: bool = False,
) -> BackPassResult:
    """Adapter: batch-major bundle -> time-major kernel -> BackPassResult."""
    sd = derivs.step
    to_tm = lambda a: jnp.moveaxis(a, 0, 1) if a.size else a
    sd_tm = jax.tree_util.tree_map(to_tm, sd)
    us_tm = jnp.moveaxis(us, 0, 1)
    l_tm, L_tm, dV, g_norm, failed = pallas_back_pass_tm(
        sd_tm, derivs.final.cx, derivs.final.cxx, us_tm, lam,
        reg_type=reg_type, full_ddp=full_ddp, interpret=interpret,
    )
    return BackPassResult(
        l=jnp.moveaxis(l_tm, 0, 1),
        L=jnp.moveaxis(L_tm, 0, 1),
        dV=dV,
        g_norm=g_norm,
        failed=failed,
    )
