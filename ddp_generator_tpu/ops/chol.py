"""Modified Cholesky (Schnabel-Eskow) -- the reference's MOD_CHOL option.

Re-derivation of ``cholesky.c:129-287`` (two-phase Schnabel-Eskow modified
Cholesky with diagonal pivoting, Gerschgorin bound pivoting in phase two, and
a closed-form 2x2 eigenvalue fix for the final block) as a jit/vmap-safe
routine for small static ``n``.

What the solver actually consumes: the reference uses ``mod_chol`` only to
*pre-condition* an indefinite ``Quu`` inside boxQP (``boxQP.c:69-72``): when
the returned perturbation is nonzero, ``perm_tri_square``
(``cholesky.c:339-356``) rebuilds ``H`` as the perturbed PSD matrix
``P^T (U^T U) P = H + P^T diag(E) P`` and boxQP proceeds on that.  So the
observable output is the *scattered diagonal perturbation*: this module
returns exactly that (plus the permutation and per-slot E for inspection).

The factorization bookkeeping (which pivots are chosen, hence which E values
accumulate) follows the reference's control flow exactly, expressed as a
static unrolled loop over columns with masked phase switching, so it
``vmap``s over batches.

The plain (unmodified) packed-triangle Cholesky kit of the reference
(``cholesky_tri``/``cholesky_solve_tri``/``cholesky_tri_inv``,
``cholesky.c:6-74``) maps to ``jnp.linalg.cholesky`` / ``cho_solve`` on dense
matrices -- packed triangles are a CPU memory optimization with no TPU
counterpart -- plus the closed forms in :mod:`.boxqp` for n <= 3.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_EPS = 2.22044604925031e-16  # matches the constant in cholesky.c:132-133


class ModCholResult(NamedTuple):
    e_scattered: Array  # (n,) diagonal perturbation in ORIGINAL index order
    perm: Array  # (n,) int32: work index -> original index
    e_work: Array  # (n,) perturbation in pivoted (work) order
    delta_prev: Array  # scalar: the reference's return value (last delta)


def _swap_rows_cols(A: Array, i, j) -> Array:
    n = A.shape[0]
    idx = jnp.arange(n)
    perm = jnp.where(idx == i, j, jnp.where(idx == j, i, idx))
    return A[perm][:, perm]


def _swap_vec(v: Array, i, j) -> Array:
    n = v.shape[0]
    idx = jnp.arange(n)
    perm = jnp.where(idx == i, j, jnp.where(idx == j, i, idx))
    return v[perm]


def _chol_step(A: Array, j: int) -> Array:
    """One factorization step on column j (``jthIteration``,
    ``cholesky.c:112-127``): trailing submatrix downdate.  Processed
    rows/cols (<= j) keep stale values; they are never read again."""
    n = A.shape[0]
    idx = jnp.arange(n)
    trail = idx > j
    # guard the sqrt/divide: by construction A[j,j] > 0 when this step runs
    d2 = jnp.maximum(A[j, j], jnp.asarray(np.finfo(np.float32).tiny, A.dtype))
    row = jnp.where(trail, A[j, :], 0.0)
    return A - jnp.outer(row, row) / d2 * jnp.outer(trail, trail)


def mod_chol(A: Array) -> ModCholResult:
    """Schnabel-Eskow perturbation of a symmetric matrix (static small n)."""
    n = A.shape[0]
    dtype = A.dtype
    tau = _EPS ** (1.0 / 3.0)
    taubar = _EPS ** (2.0 / 3.0)
    mu = 0.1
    idx = jnp.arange(n)
    P0 = jnp.arange(n, dtype=jnp.int32)

    if n == 1:
        # cholesky.c:143-150
        a = A[0, 0]
        delta = jnp.maximum(taubar * jnp.abs(a) - a, 0.0)
        delta = jnp.where(a == 0.0, jnp.asarray(taubar, dtype), delta)
        e = delta[None]
        return ModCholResult(e, P0, e, delta)

    gamma = jnp.max(jnp.abs(jnp.diagonal(A)))
    phase1 = jnp.all(jnp.diagonal(A) >= 0.0)  # cholesky.c:156-160

    P = P0
    E = jnp.zeros((n,), dtype)
    g = jnp.zeros((n,), dtype)  # Gerschgorin bounds (valid in phase 2)
    deltaprev = jnp.zeros((), dtype)
    done = jnp.zeros((), bool)
    NEG = jnp.asarray(-np.inf, dtype)
    POS = jnp.asarray(np.inf, dtype)
    last = n - 1

    for j in range(n):
        act = idx >= j
        trail = idx > j
        diag = jnp.diagonal(A)

        # ================= phase 1 attempt (cholesky.c:163-204) ===========
        p1_here = phase1 & ~done
        dm = jnp.where(act, diag, NEG)
        tmp_max = jnp.max(dm)
        pivot_id = jnp.argmax(dm)
        tmp_min = jnp.min(jnp.where(act, diag, POS))
        switch_a = (tmp_max < taubar * gamma) | (tmp_min < -mu * tmp_max)

        A_piv = _swap_rows_cols(A, j, pivot_id)
        P_piv = _swap_vec(P, j, pivot_id)
        if j < n - 1:
            schur = jnp.where(
                trail, jnp.diagonal(A_piv) - A_piv[j, :] ** 2 / A_piv[j, j], POS
            )
            tmp_min2 = jnp.minimum(jnp.min(schur), 0.0)  # C init 0.0
        else:
            tmp_min2 = jnp.zeros((), dtype)
        switch_b = (~switch_a) & (tmp_min2 < -mu * gamma)

        do_p1 = p1_here & ~switch_a & ~switch_b
        switch_now = p1_here & (switch_a | switch_b)
        # switch_a breaks BEFORE the pivot; switch_b after (cholesky.c:179-198)
        A_sw = jnp.where(switch_a, A, A_piv)
        P_sw = jnp.where(switch_a, P, P_piv)

        A_p1 = _chol_step(A_piv, j)

        # Lane state AFTER potential switch, entering phase 2 at this j:
        p2_here = (~phase1 | switch_now) & ~done
        A2 = jnp.where(switch_now, A_sw, A)
        P2 = jnp.where(switch_now, P_sw, P)

        # Gerschgorin init when ENTERING phase 2 (cholesky.c:220-229): at a
        # switch, or -- for matrices with a negative initial diagonal -- at
        # j == 0 where phase 1 never ran (phaseone false from the start,
        # cholesky.c:159).
        enter_p2 = switch_now | ((j == 0) & ~phase1 & ~done)
        offabs = jnp.where(
            jnp.outer(act, act) & ~jnp.eye(n, dtype=bool), jnp.abs(A2), 0.0
        )
        g_init = jnp.where(act, jnp.diagonal(A2) - jnp.sum(offabs, axis=1), 0.0)
        g2 = jnp.where(enter_p2, g_init, g)

        # single-element tail: phase 2 entered exactly at the last index
        # (cholesky.c:207-214)
        tail1 = p2_here & (j == last)
        a_nn = A2[last, last]
        delta_last = -a_nn + jnp.maximum(tau * a_nn / (tau - 1.0), taubar * gamma)

        if j <= n - 3:
            # ============ phase 2 regular step (cholesky.c:231-269) =======
            gm = jnp.where(act, g2, NEG)
            gid = jnp.argmax(gm)
            A_g = _swap_rows_cols(A2, j, gid)
            P_g = _swap_vec(P2, j, gid)
            g_g = _swap_vec(g2, j, gid)
            normj = jnp.sum(jnp.where(trail, jnp.abs(A_g[j, :]), 0.0))
            delta2 = jnp.maximum(
                0.0,
                jnp.maximum(jnp.maximum(normj, taubar * gamma) - A_g[j, j], deltaprev),
            )
            add2 = jnp.where(delta2 > 0.0, delta2, 0.0)
            A_g = A_g.at[j, j].add(add2)
            # Gerschgorin bound update (cholesky.c:260-266)
            upd = jnp.where(A_g[j, j] != normj, 1.0 - normj / A_g[j, j], 0.0)
            g_g = jnp.where(trail, g_g + jnp.abs(A_g[j, :]) * upd, g_g)
            A_g = _chol_step(A_g, j)

            A = jnp.where(p2_here, A_g, jnp.where(do_p1, A_p1, A))
            P = jnp.where(p2_here, P_g, jnp.where(do_p1, P_piv, P))
            g = jnp.where(p2_here, g_g, g2)
            E = jnp.where(p2_here, E.at[j].add(add2), E)
            deltaprev = jnp.where(p2_here & (delta2 > 0.0), delta2, deltaprev)
        elif j == n - 2:
            # ===== final 2x2 block via eigenvalues (cholesky.c:270-285) ===
            fix2 = p2_here  # phase 2 at j == n-2 (tail1 impossible here)
            a00, a01, a11 = A2[j, j], A2[j, j + 1], A2[j + 1, j + 1]
            disc = jnp.sqrt((a00 - a11) ** 2 + 4.0 * a01 * a01)
            lam_hi = 0.5 * ((a00 + a11) + disc)
            lam_lo = 0.5 * ((a00 + a11) - disc)
            delta3 = jnp.maximum(
                jnp.maximum(
                    0.0,
                    -lam_lo
                    + jnp.maximum(tau * (lam_hi - lam_lo) / (1.0 - tau), taubar * gamma),
                ),
                deltaprev,
            )
            add3 = jnp.where(delta3 > 0.0, delta3, 0.0)
            A_f = A2.at[j, j].add(add3).at[j + 1, j + 1].add(add3)

            A = jnp.where(fix2, A_f, jnp.where(do_p1, A_p1, A))
            P = jnp.where(fix2, P2, jnp.where(do_p1, P_piv, P))
            g = g2
            E = jnp.where(fix2, E.at[j].add(add3).at[j + 1].add(add3), E)
            deltaprev = jnp.where(fix2 & (delta3 > 0.0), delta3, deltaprev)
            done = done | fix2
        else:  # j == n-1
            A = jnp.where(do_p1, A_p1, A)
            P = jnp.where(do_p1, P_piv, P)
            g = g2
            E = jnp.where(tail1, E.at[last].add(delta_last), E)
            deltaprev = jnp.where(tail1, delta_last, deltaprev)
            done = done | tail1

        phase1 = phase1 & ~switch_now

    e_scattered = jnp.zeros((n,), dtype).at[P].add(E)
    return ModCholResult(e_scattered, P.astype(jnp.int32), E, deltaprev)


def mod_chol_perturb(H: Array) -> tuple[Array, Array]:
    """MOD_CHOL pre-regularization (``boxQP.c:69-72``).

    Returns ``(H_psd, changed)``: when the Schnabel-Eskow perturbation is
    nonzero, ``H_psd = H + P^T diag(E) P`` (the ``perm_tri_square``
    reconstruction, ``cholesky.c:339-356``); otherwise H unchanged.
    """
    r = mod_chol(0.5 * (H + H.T))
    changed = r.delta_prev > 0.0
    H_psd = H + jnp.diag(r.e_scattered)
    return jnp.where(changed, H_psd, H), changed
