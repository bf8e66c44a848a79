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
* **component-major layout**: every per-step quantity is stored
  ``(N, C, B)`` with the flattened tiny matrix index C on sublanes and the
  instance batch B on the 128-wide vector lanes, so each scalar component
  of the recursion is a full-width ``(B,)`` lane vector and the tiny
  state/control contractions are unrolled Python loops over (n_x, n_u) --
  exactly the "per-chip parallelism comes from batching small matrices"
  design of SURVEY.md section 2.  (A ``(N, B, n_x, n_x)`` layout would put
  the 4x4 on the (8,128) vector tile and waste ~98% of every op.)
* boxQP is the exact active-set enumeration (see ``boxqp.boxqp_enumerate``)
  with the 3^n_u patterns unrolled branch-free.  Persistent masks are kept
  as float 0/1 vectors (Mosaic rejects some i1 vector materializations:
  "Unsupported target bitwidth for truncation").

Numerics follow ``back_pass.c`` exactly like the scan implementation:
regType 1/2 regularization, clamped-gain assembly through the
state-dependent constraint boundary, UNregularized Quu/Qxu in the value
update, dV accumulation and the ``/(n_hor-1)`` g_norm divisor.

``batched_back_pass_pallas`` (bottom) adapts the solver's batch-major
derivative bundle and is used through ``custom_vmap`` so the per-instance
solver code keeps its serial-scan path.
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
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


def tri_size(n: int) -> int:
    """Packed upper-triangle length for a symmetric (n, n) matrix."""
    return n * (n + 1) // 2


def tri_index(a: int, b: int, n: int) -> int:
    """Row-major upper-triangle index of (a, b), a <= b, in an (n, n) matrix.

    The bundle stores symmetric matrices (cxx, cuu, and the last two axes of
    fxx/fuu) packed: the TPU keep of the reference's packed-triangle idea
    (``matMult.h:8-9``) -- here it buys ~20% less HBM bundle traffic rather
    than cache locality."""
    assert a <= b
    return a * n - a * (a - 1) // 2 + (b - a)


def pack_sym_components(full_rows, n: int):
    """[(a,b) row-major full] component list -> packed upper-triangle list."""
    return [full_rows[a * n + b] for a in range(n) for b in range(a, n)]


def _sym_solve_small(H, rhs, free, n):
    """Masked free-set solve via closed-form inverse; H, rhs are dicts of
    (B,) vectors: H[(i,j)], rhs[i].  Returns (x dict, pd_ok (B,), inv fn).

    free: tuple of static bools per index (the clamp pattern).  Only the
    FREE submatrix is solved (clamped rows/cols are statically zero in
    every consumed value) -- bit-identical to the padded-identity form it
    replaces, at a fraction of the divisions for clamped patterns (the
    dominant cost of the 3^n_u enumeration on the VPU).
    """
    idxs = [i for i in range(n) if free[i]]
    m = len(idxs)
    if m > 3:
        raise NotImplementedError("pallas backward pass supports n_u <= 3")

    def h(i, j):
        return H[(min(idxs[i], idxs[j]), max(idxs[i], idxs[j]))]

    inv = {}
    if m == 0:
        # All clamped: nothing to solve; the identity-padded form was
        # unconditionally PD.
        ok = jnp.ones_like(rhs[0], bool)
    elif m == 1:
        a = h(0, 0)
        ok = a > 0.0
        det = jnp.where(ok, a, 1.0)
        inv = {(0, 0): 1.0 / det}
    elif m == 2:
        a, b, d = h(0, 0), h(0, 1), h(1, 1)
        det = a * d - b * b
        ok = (a > 0.0) & (det > 0.0)
        sdet = jnp.where(ok, det, 1.0)
        inv = {(0, 0): d / sdet, (0, 1): -b / sdet, (1, 1): a / sdet}
    else:
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

    pos = {gi: i for i, gi in enumerate(idxs)}  # global -> submatrix index

    def iv(i, j):
        # zero outside the free block
        if not (free[i] and free[j]):
            return jnp.zeros_like(rhs[0])
        a_, b_ = pos[i], pos[j]
        return inv[(min(a_, b_), max(a_, b_))]

    x = [
        sum(iv(i, j) * rhs[j] for j in idxs) if free[i]
        else jnp.zeros_like(rhs[0])
        for i in range(n)
    ]
    return x, ok, iv


def riccati_step(
    NX: int,
    NU: int,
    reg_type: int,
    full_ddp: bool,
    fx, fu, cx, cu, cxx, cuu, cxu,  # nested lists of (B,) lane vectors
    fxx, fuu, fxu,  # [i][a][b] nested lists (None when not full_ddp)
    lower, upper, lo_hx, up_hx, lo_s, up_s,  # lists / nested lists
    u_k,  # list of (B,)
    lam,  # (B,)
    Vx, Vxx,  # carry component lists
):
    """One backward-recursion step on component lane-vectors.

    The shared math of the streamed-derivative kernel (below) and the fused
    derivs+backpass kernel (``pallas_fused.py``): Q-build, regularization,
    exact active-set boxQP, clamped-gain assembly, value update, dV and
    g_norm contributions -- ``back_pass.c:80-251`` semantics exactly.

    Returns ``(l_k, L_k, dv0, dv1, Vx_new, Vxx_new, g_k, step_failed_f)``
    where ``step_failed_f`` is a float 0/1 mask.
    """
    pats = _patterns(NU)

    # Q builds (back_pass.c:80-131)
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
                    Vx[i_] * fxu[i_][a][b] for i_ in range(NX)
                )
        for a in range(NU):
            for b in range(NU):
                Quu[a][b] = Quu[a][b] + sum(
                    Vx[i_] * fuu[i_][a][b] for i_ in range(NX)
                )
        for a in range(NX):
            for b in range(NX):
                Qxx[a][b] = Qxx[a][b] + sum(
                    Vx[i_] * fxx[i_][a][b] for i_ in range(NX)
                )

    # regularization (back_pass.c:133-159)
    if reg_type == 2:
        QuuF = [[Quu[a][b] + lam * sum(fu[i_][a] * fu[i_][b] for i_ in range(NX))
                 for b in range(NU)] for a in range(NU)]
        Qxu_reg = [[Qxu[a][b] + lam * sum(fx[i_][a] * fu[i_][b] for i_ in range(NX))
                    for b in range(NU)] for a in range(NX)]
    else:
        QuuF = [[Quu[a][b] + lam if a == b else Quu[a][b]
                 for b in range(NU)] for a in range(NU)]
        Qxu_reg = Qxu

    finite_lo = [jnp.isfinite(lower[a]) for a in range(NU)]
    finite_up = [jnp.isfinite(upper[a]) for a in range(NU)]
    Hd = {(a, b): QuuF[a][b] for a in range(NU) for b in range(a, NU)}

    zeros = jnp.zeros_like(Qu[0])
    ones = jnp.ones_like(zeros)
    # Full-H solve, shared between the PD gate (boxqp_enumerate) and the
    # all-free pattern in the loop below (which previously re-ran the same
    # closed-form inverse on an identical rhs: xc == 0 there, so
    # rhs == -Qu).
    all_free = tuple([True] * NU)
    x_free, pd_full, iv_full = _sym_solve_small(
        Hd, [-Qu[a] for a in range(NU)], all_free, NU
    )

    # Persistent selection state as float 0/1 masks (see module doc).
    best_valid = zeros  # 0/1
    best_x = [zeros for _ in range(NU)]
    best_cl_lo = [zeros for _ in range(NU)]
    best_cl_up = [zeros for _ in range(NU)]
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

        if free == all_free:
            xf, pd_ok, iv = x_free, pd_full, iv_full
        else:
            # rhs = -(g + H xc), solve on the free block; only CLAMPED
            # dims contribute to Hxc (xc is zero on free dims).
            clamped = [b for b in range(NU) if not free[b]]
            rhs = [
                -(Qu[a] + sum(Hd[(min(a, b), max(a, b))] * xc[b]
                              for b in clamped))
                if free[a] else zeros
                for a in range(NU)
            ]
            xf, pd_ok, iv = _sym_solve_small(Hd, rhs, free, NU)
        x = [xf[a] if free[a] else xc[a] for a in range(NU)]
        grad = [
            Qu[a] + sum(Hd[(min(a, b), max(a, b))] * x[b] for b in range(NU))
            for a in range(NU)
        ]
        kkt = pd_ok if bound_ok is None else (bound_ok & pd_ok)
        for a in range(NU):
            if free[a]:
                kkt = kkt & (x[a] >= lower[a]) & (x[a] <= upper[a])
            elif at_lo[a]:
                kkt = kkt & (grad[a] >= 0.0)
            else:
                kkt = kkt & (grad[a] <= 0.0)
        take = jnp.where(kkt, 1.0 - best_valid, zeros)  # 0/1 float
        for a in range(NU):
            best_x[a] = best_x[a] + take * (x[a] - best_x[a])
            if at_lo[a]:
                best_cl_lo[a] = best_cl_lo[a] + take * (ones - best_cl_lo[a])
            if at_up[a]:
                best_cl_up[a] = best_cl_up[a] + take * (ones - best_cl_up[a])
            for b in range(NU):
                best_inv[(a, b)] = best_inv[(a, b)] + take * (
                    iv(a, b) - best_inv[(a, b)]
                )
        best_valid = best_valid + take

    step_failed_f = jnp.where(pd_full, ones - best_valid, ones)  # 0/1
    l_k = best_x

    # D[j,:] = sign_j * hx_j for clamped j (back_pass.c:193-199)
    D = [[best_cl_lo[a] * lo_s[a] * lo_hx[a][b]
          + best_cl_up[a] * up_s[a] * up_hx[a][b]
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
    g_k = jnp.abs(l_k[0]) / (jnp.abs(u_k[0]) + 1.0)
    for a in range(1, NU):
        g_k = jnp.maximum(g_k, jnp.abs(l_k[a]) / (jnp.abs(u_k[a]) + 1.0))

    return l_k, L_k, dv0, dv1, Vx_new, Vxx_new, g_k, step_failed_f


def _make_kernel(n_x: int, n_u: int, reg_type: int, full_ddp: bool, N: int,
                 S: int = 1):
    """S = time steps per grid iteration.  The recursion math per step is a
    few thousand lane-vector ops (~1-2 us of VPU work at B=2048) while a TPU
    grid step costs ~4 us of fixed sequencing/DMA overhead -- measured: the
    whole S=1 kernel runs at ~2.1 ms for N=500 regardless of per-step work.
    Blocking S steps per grid iteration amortizes that fixed cost; the S
    sub-steps run as an unrolled in-kernel loop on VMEM-resident blocks."""
    NX, NU = n_x, n_u

    def kernel(
        # step inputs (per-block refs, shape (C, 1, S, BT) -- component-
        # OUTER with the time axis pre-split (C, G, S, B) so the minor-two
        # block dims equal the array dims; the emission stacks per-component
        # (N, B) arrays on a new leading axis, the one concatenation XLA
        # lowers copy-free); FULL_DDP tensor refs present only when
        # full_ddp:
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
        vx_s, vxx_s, dv_s, g_s, fail_s = (
            next(it), next(it), next(it), next(it), next(it)
        )

        # grid = (batch_tiles, time_blocks); time is innermost so the VMEM
        # value-function carry is re-initialized once per batch tile.
        i = pl.program_id(1)
        is_first = i == 0
        is_last = i == (N // S) - 1

        @pl.when(is_first)
        def _init():
            vx_s[...] = vx0_ref[...]
            vxx_s[...] = vxx0_ref[...]
            dv_s[...] = jnp.zeros_like(dv_s)
            g_s[...] = jnp.zeros_like(g_s)
            fail_s[...] = jnp.zeros_like(fail_s)

        # Flattened component index helpers (row-major over the tiny dims).
        XX = lambda a, b: a * NX + b  # (n_x, n_x)
        XU = lambda a, b: a * NU + b  # (n_x, n_u)
        UU = lambda a, b: a * NU + b  # (n_u, n_u)
        # Symmetric inputs arrive PACKED (upper triangle, row-major).
        TX = lambda a, b: tri_index(min(a, b), max(a, b), NX)
        TU = lambda a, b: tri_index(min(a, b), max(a, b), NU)
        TXS, TUS = tri_size(NX), tri_size(NU)

        lam = lam_ref[0, :]
        # Value-function carry as in-register values across the unrolled
        # in-block steps; flushed to VMEM scratch once per grid iteration.
        Vx = [vx_s[a, :] for a in range(NX)]
        Vxx = [[vxx_s[XX(a, b), :] for b in range(NX)] for a in range(NX)]
        dv_acc = [dv_s[0, :], dv_s[1, :]]
        g_acc = g_s[0, :]
        fail_acc = fail_s[0, :]

        # Reverse time inside the block: in-block row j is time step
        # block_start + j, so the recursion visits j = S-1 .. 0.
        for j in range(S - 1, -1, -1):
            fx = [[fx_ref[XX(a, b), 0, j, :] for b in range(NX)]
                  for a in range(NX)]
            fu = [[fu_ref[XU(a, b), 0, j, :] for b in range(NU)]
                  for a in range(NX)]
            cx = [cx_ref[a, 0, j, :] for a in range(NX)]
            cu = [cu_ref[a, 0, j, :] for a in range(NU)]
            cxx = [[cxx_ref[TX(a, b), 0, j, :] for b in range(NX)]
                   for a in range(NX)]
            cuu = [[cuu_ref[TU(a, b), 0, j, :] for b in range(NU)]
                   for a in range(NU)]
            cxu = [[cxu_ref[XU(a, b), 0, j, :] for b in range(NU)]
                   for a in range(NX)]
            if full_ddp:
                # (i, packed(a, b)) indices on the C axis; the last two axes
                # of fxx/fuu are symmetric (mixed-partial symmetry)
                fxx = [[[fxx_ref[i_ * TXS + TX(a, b), 0, j, :]
                         for b in range(NX)]
                        for a in range(NX)] for i_ in range(NX)]
                fuu = [[[fuu_ref[i_ * TUS + TU(a, b), 0, j, :]
                         for b in range(NU)]
                        for a in range(NU)] for i_ in range(NX)]
                fxu = [[[fxu_ref[(i_ * NX + a) * NU + b, 0, j, :]
                         for b in range(NU)]
                        for a in range(NX)] for i_ in range(NX)]
            else:
                fxx = fuu = fxu = None
            lower = [lower_ref[a, 0, j, :] for a in range(NU)]
            upper = [upper_ref[a, 0, j, :] for a in range(NU)]
            # lower_hx/upper_hx are (n_u, n_x) row-major on the comp axis.
            lo_hx = [[lo_hx_ref[a * NX + b, 0, j, :] for b in range(NX)]
                     for a in range(NU)]
            up_hx = [[up_hx_ref[a * NX + b, 0, j, :] for b in range(NX)]
                     for a in range(NU)]
            lo_s = [lo_s_ref[a, 0, j, :] for a in range(NU)]
            up_s = [up_s_ref[a, 0, j, :] for a in range(NU)]
            u_k = [u_ref[a, 0, j, :] for a in range(NU)]

            (l_k, L_k, dv0, dv1, Vx_new, Vxx_new, g_k,
             step_failed_f) = riccati_step(
                NX, NU, reg_type, full_ddp,
                fx, fu, cx, cu, cxx, cuu, cxu, fxx, fuu, fxu,
                lower, upper, lo_hx, up_hx, lo_s, up_s, u_k, lam,
                Vx, Vxx,
            )

            # live = 1 while no step has failed yet (freeze after failure)
            fail_acc = jnp.minimum(fail_acc + step_failed_f, 1.0)
            live = 1.0 - fail_acc

            # write per-step outputs (zero once failed, like the scan
            # version)
            for a in range(NU):
                l_ref[j, a, :] = live * l_k[a]
                for b in range(NX):
                    L_ref[j, a * NX + b, :] = live * L_k[a][b]

            # carry updates (freeze after failure)
            Vx = [Vx[a] + live * (Vx_new[a] - Vx[a]) for a in range(NX)]
            Vxx = [[Vxx[a][b] + live * (Vxx_new[a][b] - Vxx[a][b])
                    for b in range(NX)] for a in range(NX)]
            dv_acc = [dv_acc[0] + live * dv0, dv_acc[1] + live * dv1]
            g_acc = g_acc + live * g_k

        for a in range(NX):
            vx_s[a, :] = Vx[a]
            for b in range(NX):
                vxx_s[XX(a, b), :] = Vxx[a][b]
        dv_s[0, :] = dv_acc[0]
        dv_s[1, :] = dv_acc[1]
        g_s[0, :] = g_acc
        fail_s[0, :] = fail_acc

        @pl.when(is_last)
        def _fin():
            dv_ref[...] = dv_s[...]
            gnorm_ref[0, :] = g_s[0, :] / float(N - 1)
            failed_ref[...] = fail_s[...]

    return kernel


def _pick_time_block(N: int, comps_per_step: int, B: int, itemsize: int,
                     vmem_budget: int = 11 * 2 ** 20) -> int:
    """Largest divisor S of N whose double-buffered blocks fit the VMEM
    budget (~16 MB/core total; leave slack for scratch + compiler temps)."""
    per_step = comps_per_step * B * itemsize * 2  # x2: double buffering
    best = 1
    for s in range(2, min(N, 16) + 1):
        if N % s == 0 and s * per_step <= vmem_budget:
            best = s
    return best


def _pick_blocks(N: int, B: int, comps: int, itemsize: int,
                 vmem_budget: int = 11 * 2 ** 20,
                 s_force: int | None = None):
    """Choose (S time steps, BT batch tile) minimizing grid steps under the
    VMEM budget.  Blocks are (C, S, BT): the minor-two dims (S, BT) are
    hardware-tiled (8, 128), so VMEM cost rounds S up to 8 sublanes.

    ``s_force`` pins S (user ``time_block``) and selects only BT -- the
    (S, BT) pair is always validated jointly against the budget."""
    best = None
    # Candidate tiles must divide B AND stay 128-lane-aligned (Mosaic:
    # block minor dims must be (8,128)-divisible or equal to the array
    # dim); plain halving can produce illegal tiles for B = 128*odd
    # (e.g. B=4480 halves to 2240 = 17.5 lane tiles).
    if B % 128 == 0:
        m = B // 128
        bts = sorted((128 * d for d in range(1, m + 1) if m % d == 0),
                     reverse=True)
    else:
        bts = [B]
    # Auto-S restricted to powers of two <= 8 (one sublane tile): measured
    # on v5e at B=2048/N=500, S=16 forces smaller batch tiles under the
    # VMEM budget and loses (4.26 ms vs S=4's 2.96 ms), and non-power-of-2
    # S is slower even with fewer grid steps (S=5: 4.32, S=10: 4.28 ms vs
    # S=4: 2.96; S=1: 3.17, S=2: 3.03).  A user time_block is honored
    # verbatim.
    ss = [s_force] if s_force is not None else [1, 2, 4, 8]
    for s in ss:
        if N % s:
            continue
        s_pad = -(-s // 8) * 8 if B >= 128 else s  # sublane padding
        for bt in bts:
            vmem = comps * s_pad * bt * itemsize * 2  # x2 double buffering
            if vmem <= vmem_budget:
                steps = (N // s) * (B // bt)
                cand = (steps, -s, B // bt)  # prefer fewer steps, larger S
                if best is None or cand < best[0]:
                    best = (cand, s, bt)
                break
    if best is None:
        if s_force is not None:
            raise ValueError(
                f"time_block={s_force} does not fit the VMEM budget "
                f"({vmem_budget} B) at any batch tile of B={B}"
            )
        # Fallback: smallest blocks.  BT must DIVIDE B or the grid silently
        # under-covers the batch (tail lanes uninitialized).
        bt = B
        if B > 128:
            for d in range(128, 0, -1):
                if B % d == 0:
                    bt = d
                    break
        return 1, bt
    return best[1], best[2]


@functools.partial(
    jax.jit,
    static_argnames=("n_x", "reg_type", "full_ddp", "interpret", "time_block"),
)
def pallas_back_pass_cm(
    sd_cm,  # StepDerivs pytree, COMPONENT-OUTER (C, N, B); cxx/cuu and the
    #         last two axes of fxx/fuu PACKED (upper triangle, row-major).
    #         The leading component axis is an OUTERMOST-axis stack of
    #         per-component (N, B) arrays -- the one concatenation XLA
    #         lowers copy-free (a middle-axis stack double-materializes the
    #         whole ~0.65 GB bundle through windowed DUS fusions + copies).
    final_cx,  # (n_x, B)
    final_cxx,  # (n_x*n_x, B)
    us_cm,  # (n_u, N, B)
    lam,  # (1, B)
    n_x: int,
    reg_type: int,
    full_ddp: bool,
    interpret: bool = False,
    time_block: int | None = None,  # steps per grid iteration (None = auto)
):
    n_u, N, B = us_cm.shape
    dtype = us_cm.dtype

    # Fail fast on layout mistakes: a transposed us_cm mis-reads the horizon
    # as n_u, which (without this guard) sends _patterns into a 3^N
    # enumeration that never terminates (root cause of the round-3 bench
    # hang).  All inputs must be component-OUTER.
    if n_u > 3:
        raise NotImplementedError(
            "pallas backward pass supports n_u <= 3, got n_u="
            f"{n_u} from us_cm.shape={us_cm.shape}; us_cm must be "
            "component-outer (n_u, N, B)"
        )
    if sd_cm.cx.shape != (n_x, N, B) or sd_cm.cu.shape != (n_u, N, B):
        raise ValueError(
            "component-outer (C, N, B) bundle expected: cx "
            f"{sd_cm.cx.shape} != {(n_x, N, B)} or cu {sd_cm.cu.shape} != "
            f"{(n_u, N, B)}"
        )
    if final_cx.shape != (n_x, B) or final_cxx.shape != (n_x * n_x, B):
        raise ValueError(
            f"final_cx {final_cx.shape} / final_cxx {final_cxx.shape} must "
            f"be {(n_x, B)} / {(n_x * n_x, B)}"
        )

    step_inputs = [
        sd_cm.fx, sd_cm.fu, sd_cm.cx, sd_cm.cu, sd_cm.cxx, sd_cm.cuu,
        sd_cm.cxu,
    ]
    if full_ddp:
        step_inputs += [sd_cm.fxx, sd_cm.fuu, sd_cm.fxu]
    step_inputs += [
        sd_cm.lower, sd_cm.upper, sd_cm.lower_hx, sd_cm.upper_hx,
        sd_cm.lower_sign, sd_cm.upper_sign, us_cm,
    ]
    comps = sum(a.shape[0] for a in step_inputs) + n_u + n_u * n_x  # + l, L
    if interpret and time_block is None:
        # Interpret mode (CPU tests) pays trace/compile cost linear in the
        # unroll; keep blocks minimal there (perf is a TPU-only concern).
        S, BT = (2 if N % 2 == 0 else 1), B
    else:
        if time_block is not None and N % time_block:
            raise ValueError(f"time_block {time_block} must divide N={N}")
        S, BT = _pick_blocks(N, B, comps, jnp.dtype(dtype).itemsize,
                             s_force=time_block)
    G = N // S
    NBT = B // BT

    kernel = _make_kernel(n_x, n_u, reg_type, full_ddp, N, S)

    # Index maps take (bt, g); zeros derived from the args stay int32 --
    # a literal 0 under jax_enable_x64 becomes an i64 constant, which
    # Mosaic refuses to return from the index-map function.
    #
    # Step inputs are reshaped (C, N, B) -> (C, G, S, B) -- a copy-free
    # split of the time axis -- and blocked (C, 1, S, BT).  Mosaic requires
    # a block's minor-two dims to be (8, 128)-divisible OR equal to the
    # array dims; with the 4-D form the minor-two are (S, BT) against array
    # dims (S, B), so any S that divides N is legal.  (A 3-D (C, S, BT)
    # block of (C, N, B) is rejected on hardware whenever S % 8 != 0.)
    def rev(bt, g):  # (C, 1, S, BT) block of a (C, G, S, B) array
        z = bt - bt
        return (z, G - 1 - g, z, bt)

    def spec(a):
        return pl.BlockSpec((a.shape[0], 1, S, BT), rev,
                            memory_space=pltpu.VMEM)

    fixed_inputs = [a.reshape(a.shape[0], G, S, B) for a in step_inputs]
    in_specs = [spec(a) for a in step_inputs]
    per_bt = lambda a: pl.BlockSpec(
        (a.shape[0], BT), lambda bt, g: (bt - bt, bt),
        memory_space=pltpu.VMEM,
    )
    in_specs += [per_bt(lam), per_bt(final_cx), per_bt(final_cxx)]

    out_shape = [
        jax.ShapeDtypeStruct((N, n_u, B), dtype),  # l
        jax.ShapeDtypeStruct((N, n_u * n_x, B), dtype),  # L (row-major u,x)
        jax.ShapeDtypeStruct((2, B), dtype),  # dV
        jax.ShapeDtypeStruct((1, B), dtype),  # g_norm
        jax.ShapeDtypeStruct((1, B), dtype),  # failed (0/1)
    ]
    rev2 = lambda bt, g: (G - 1 - g, bt - bt, bt)
    fix2 = lambda bt, g: (bt - bt, bt)
    out_specs = [
        pl.BlockSpec((S, n_u, BT), rev2, memory_space=pltpu.VMEM),
        pl.BlockSpec((S, n_u * n_x, BT), rev2, memory_space=pltpu.VMEM),
        pl.BlockSpec((2, BT), fix2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BT), fix2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BT), fix2, memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((n_x, BT), dtype),
        pltpu.VMEM((n_x * n_x, BT), dtype),
        pltpu.VMEM((2, BT), dtype),
        pltpu.VMEM((1, BT), dtype),
        pltpu.VMEM((1, BT), dtype),
    ]
    l_cm, L_cm, dV, g_norm, failed = pl.pallas_call(
        kernel,
        grid=(NBT, G),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*fixed_inputs, lam, final_cx, final_cxx)
    return l_cm, L_cm, dV, g_norm, failed > 0.0


def batched_back_pass_pallas(
    derivs: DerivBundle,  # batch-major: each step array (B, N, ...)
    us: Array,  # (B, N, n_u)
    lam: Array,  # (B,)
    reg_type: int,
    full_ddp: bool,
    interpret: bool = False,
    time_block: int | None = None,
) -> BackPassResult:
    """Adapter: batch-major bundle -> packed component-major kernel -> result.

    Kept for per-lane-params solves and kernel unit tests; the production
    path (``ops/cm_derivs.py``) emits the packed component-major bundle
    directly and never pays these transposes."""
    sd = derivs.step
    B, N, n_u = us.shape
    n_x = derivs.final.cx.shape[-1]

    def to_cm(a):  # (B, N, d...) -> (prod(d), N, B) component-outer
        if not a.size:
            return a.reshape(-1, N, B)
        flat = a.reshape(B, N, -1)
        return jnp.transpose(flat, (2, 1, 0))

    def to_cm_sym(a, n):  # (B, N, ..., n, n) sym in last 2 -> packed CM
        if not a.size:
            return a.reshape(-1, N, B)
        ia = [i for i in range(n) for _ in range(i, n)]
        ib = [j for i in range(n) for j in range(i, n)]
        sel = a[..., ia, ib]  # (B, N, ..., tri)
        return to_cm(sel)

    sd_cm = sd._replace(
        cxx=to_cm_sym(sd.cxx, n_x),
        cuu=to_cm_sym(sd.cuu, n_u),
        fxx=to_cm_sym(sd.fxx, n_x),
        fuu=to_cm_sym(sd.fuu, n_u),
        **{
            f: to_cm(getattr(sd, f))
            for f in sd._fields
            if f not in ("cxx", "cuu", "fxx", "fuu")
        },
    )
    us_cm = to_cm(us)
    final_cx = jnp.transpose(derivs.final.cx, (1, 0))
    final_cxx = jnp.transpose(derivs.final.cxx.reshape(B, -1), (1, 0))
    l_cm, L_cm, dV, g_norm, failed = pallas_back_pass_cm(
        sd_cm, final_cx, final_cxx, us_cm, lam[None, :], n_x,
        reg_type=reg_type, full_ddp=full_ddp, interpret=interpret,
        time_block=time_block,
    )
    return BackPassResult(
        l=jnp.transpose(l_cm, (2, 0, 1)),
        L=jnp.transpose(L_cm, (2, 0, 1)).reshape(B, N, n_u, n_x),
        dV=jnp.transpose(dV, (1, 0)),
        g_norm=g_norm[0],
        failed=failed[0],
    )
