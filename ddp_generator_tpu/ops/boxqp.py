"""Box-constrained QP: Tassa's projected-Newton boxQP, jit/vmap-safe.

Faithful re-derivation of ``boxQP.c:39-238`` as a fixed-shape, fully masked
``lax.while_loop``: the reference's active-set index compaction
(``boxQP.c:129-146``) becomes a *masked* Cholesky factorization (clamped
rows/cols replaced by identity), and all seven data-dependent exits become a
result code selected inside the loop carry.

Result codes (identical meaning to the reference):

*  1: maxIter reached            (``boxQP.c:237``)
*  2: minStep reached in Armijo  (``boxQP.c:223-224``)
*  4: relative improvement below tol (``boxQP.c:85-86``)
*  5: gradient norm below tol    (``boxQP.c:149-150``)
*  6: all dimensions clamped     (``boxQP.c:125-126``)
* -1: Cholesky failed (non-PD free-set Hessian) (``boxQP.c:141-143``)
* -2: non-descent search direction (``boxQP.c:193-196``)

``res < 1`` makes the backward pass fail and the outer loop raise lambda
(``back_pass.c:168-171``, ``iLQG.c:272-275``).

Hyper-parameters mirror ``boxQP.c:52-57``.
"""

from __future__ import annotations

import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


class BoxQPHyper(NamedTuple):
    max_iter: int = 100
    min_grad: float = 1e-8
    min_rel_improve: float = 1e-8
    step_dec: float = 0.6
    min_step: float = 1e-22
    armijo: float = 0.1
    # "newton": faithful projected-Newton while_loop (boxQP.c).
    # "enumerate": exact active-set enumeration (TPU-native; n <= 3).
    # "auto": enumerate for n <= 3, newton otherwise.
    method: str = "auto"
    # MOD_CHOL (boxQP.c:69-72, off by default like the reference):
    # precondition an indefinite H by the Schnabel-Eskow perturbation.
    use_mod_chol: bool = False


class BoxQPResult(NamedTuple):
    x: Array  # (n,) solution
    res: Array  # scalar int32 result code
    clamped: Array  # (n,) int32: 0 free, 1 at lower, 2 at upper
    free: Array  # (n,) bool
    inv_h_free: Array  # (n, n) masked inverse of H[free,free] (zeros elsewhere)
    n_free: Array  # scalar int32


def _masked_chol_inverse(H: Array, free: Array):
    """Cholesky-inverse of the free-set submatrix without index compaction.

    Clamped rows/cols of H are replaced by identity so the dense factorization
    equals the compacted one (``boxQP.c:129-146``) on the free block; the
    inverse is then re-masked to zero outside the free block.

    For n <= 3 (the common control dimensions; the car has N_U=2) the inverse
    and the positive-definiteness test use closed forms (Sylvester's
    criterion: all leading principal minors positive <=> Cholesky succeeds) --
    a generic Cholesky on a 2x2 inside a scan x while_loop nest is pure
    scalar-unit overhead on TPU.
    """
    n = H.shape[0]
    fmask = jnp.outer(free, free)
    eye = jnp.eye(n, dtype=H.dtype)
    Hm = jnp.where(fmask, H, eye)
    if n == 1:
        ok = (Hm[0, 0] > 0.0) & jnp.isfinite(Hm[0, 0])
        inv = jnp.where(ok, 1.0 / Hm[0, 0], 1.0)[None, None]
    elif n == 2:
        a, b, d = Hm[0, 0], Hm[0, 1], Hm[1, 1]
        det = a * d - b * b
        ok = (a > 0.0) & (det > 0.0) & jnp.all(jnp.isfinite(Hm))
        safe_det = jnp.where(ok, det, 1.0)
        inv = jnp.stack([jnp.stack([d, -b]), jnp.stack([-b, a])]) / safe_det
    elif n == 3:
        a, b, c = Hm[0, 0], Hm[0, 1], Hm[0, 2]
        d, e, f = Hm[1, 1], Hm[1, 2], Hm[2, 2]
        m1 = a
        m2 = a * d - b * b
        det = a * (d * f - e * e) - b * (b * f - c * e) + c * (b * e - c * d)
        ok = (m1 > 0.0) & (m2 > 0.0) & (det > 0.0) & jnp.all(jnp.isfinite(Hm))
        safe_det = jnp.where(ok, det, 1.0)
        adj = jnp.stack(
            [
                jnp.stack([d * f - e * e, c * e - b * f, b * e - c * d]),
                jnp.stack([c * e - b * f, a * f - c * c, b * c - a * e]),
                jnp.stack([b * e - c * d, b * c - a * e, a * d - b * b]),
            ]
        )
        inv = adj / safe_det
    else:
        chol = jnp.linalg.cholesky(Hm)
        diag = jnp.diagonal(chol)
        ok = jnp.all(jnp.isfinite(chol)) & jnp.all(diag > 0.0)
        safe_chol = jnp.where(ok, chol, eye)
        inv = jax.scipy.linalg.cho_solve((safe_chol, True), eye)
    inv = jnp.where(fmask, inv, 0.0)
    return inv, ok


def _quad_value(H: Array, g: Array, x: Array) -> Array:
    return x @ (g + 0.5 * (H @ x))


class _Carry(NamedTuple):
    x: Array
    value: Array
    oldvalue: Array
    clamped: Array  # int32 (n,)
    inv_h: Array
    res: Array  # int32, 0 = still running
    it: Array  # int32


def boxqp_enumerate(
    H: Array,  # (n, n) symmetric positive definite (regularized Quu)
    g: Array,  # (n,)
    lower: Array,  # (n,) may be -inf
    upper: Array,  # (n,) may be +inf
    hyper: BoxQPHyper = BoxQPHyper(),
) -> BoxQPResult:
    """Exact box-QP by active-set enumeration -- the TPU-native boxQP.

    The reference's projected-Newton iteration (``boxQP.c:39-238``) is a
    serial-CPU algorithm; inside a ``lax.scan`` x ``vmap`` nest each of its
    while_loop iterations is a separate device region, which dominated the
    backward-pass runtime.  For a *convex* QP (H PD -- guaranteed by the
    Levenberg-Marquardt regularization, ``back_pass.c:156-158``) the optimum
    is characterized by KKT: there are only 3^n possible clamp patterns
    (free / at-lower / at-upper per input), so for the small control
    dimensions of this problem class (N_U=2 for the car) we solve every
    pattern in closed form, branch-free, and select the KKT-consistent one.
    Same optimum as the Newton iteration converges to, zero loop overhead.

    Result codes map onto the reference's: the all-clamped winner returns 6
    (``boxQP.c:125-126``); no valid pattern (non-PD free block / no KKT
    point) returns -1 and fails the backward pass exactly like a Cholesky
    failure (``boxQP.c:141-143``).
    """
    n = H.shape[0]
    dtype = H.dtype
    i32 = jnp.int32

    finite_lo = jnp.isfinite(lower)
    finite_up = jnp.isfinite(upper)

    # Non-convex guard: the reference fails (res=-1) when the Cholesky of
    # its current free set is indefinite -- in the typical DDP flow that is
    # the full H on the first iteration (boxQP.c:129-143).  Enumeration on an
    # indefinite H could otherwise "validate" a spurious KKT corner.
    _, pd_full = _masked_chol_inverse(H, jnp.ones((n,), bool))

    # Pattern order: all-free first, then increasing number of clamps, so
    # degenerate ties (x exactly on a bound with zero gradient) resolve to
    # the least-clamped pattern, matching the Newton iteration's clamp test
    # (x<=lower AND grad>0), boxQP.c:105-114.
    patterns = sorted(
        itertools.product((0, 1, 2), repeat=n),
        key=lambda pat: sum(1 for v in pat if v),
    )

    best_valid = jnp.zeros((), bool)
    best_x = jnp.zeros((n,), dtype)
    best_clamped = jnp.zeros((n,), i32)
    best_inv = jnp.zeros((n, n), dtype)

    for pat in patterns:
        pat_arr = jnp.asarray(pat, i32)
        at_lo = pat_arr == 1
        at_up = pat_arr == 2
        free = pat_arr == 0
        # Clamping at an infinite bound is meaningless.
        bound_ok = jnp.all(jnp.where(at_lo, finite_lo, True)) & jnp.all(
            jnp.where(at_up, finite_up, True)
        )
        xc = jnp.where(at_lo, lower, jnp.where(at_up, upper, 0.0))
        xc = jnp.where(jnp.isfinite(xc), xc, 0.0)
        inv, pd_ok = _masked_chol_inverse(H, free)
        # H_FF x_F = -(g_F + H_FC x_C)
        rhs = -(g + H @ xc)
        xf = inv @ rhs  # zero on clamped rows by masking
        x = jnp.where(free, xf, xc)
        grad = g + H @ x
        eps = jnp.asarray(0.0, dtype)
        kkt = (
            jnp.all(jnp.where(free, (x >= lower) & (x <= upper), True))
            & jnp.all(jnp.where(at_lo, grad >= eps, True))
            & jnp.all(jnp.where(at_up, grad <= eps, True))
        )
        valid = bound_ok & pd_ok & kkt & jnp.all(jnp.isfinite(x))
        take = valid & ~best_valid
        best_x = jnp.where(take, x, best_x)
        best_clamped = jnp.where(take, pat_arr, best_clamped)
        best_inv = jnp.where(take, inv, best_inv)
        best_valid = best_valid | valid

    all_clamped = jnp.all(best_clamped != 0)
    res = jnp.where(
        ~(best_valid & pd_full),
        jnp.asarray(-1, i32),
        jnp.where(all_clamped, jnp.asarray(6, i32), jnp.asarray(5, i32)),
    )
    free = best_clamped == 0
    return BoxQPResult(
        x=best_x,
        res=res,
        clamped=best_clamped,
        free=free,
        inv_h_free=best_inv,
        n_free=jnp.sum(free.astype(jnp.int32)),
    )


def boxqp(
    H: Array,  # (n, n) symmetric (regularized Quu)
    g: Array,  # (n,)
    lower: Array,  # (n,) may be -inf
    upper: Array,  # (n,) may be +inf
    x0: Array,  # (n,) warm start (l from step k+1, back_pass.c:163-166)
    hyper: BoxQPHyper = BoxQPHyper(),
) -> BoxQPResult:
    if hyper.use_mod_chol:
        # MOD_CHOL pre-regularization (boxQP.c:69-72): replace an indefinite
        # H by its Schnabel-Eskow PSD perturbation before solving.
        from .chol import mod_chol_perturb

        H, _ = mod_chol_perturb(H)
    if hyper.method == "enumerate" or (hyper.method == "auto" and H.shape[0] <= 3):
        return boxqp_enumerate(H, g, lower, upper, hyper)
    return boxqp_newton(H, g, lower, upper, x0, hyper)


def boxqp_newton(
    H: Array,
    g: Array,
    lower: Array,
    upper: Array,
    x0: Array,
    hyper: BoxQPHyper = BoxQPHyper(),
) -> BoxQPResult:
    n = H.shape[0]
    dtype = H.dtype
    i32 = jnp.int32

    x_init = jnp.clip(x0, lower, upper)
    value_init = _quad_value(H, g, x_init)

    def cond(c: _Carry):
        return (c.res == 0) & (c.it < hyper.max_iter)

    def body(c: _Carry) -> _Carry:
        res = jnp.asarray(0, i32)

        # --- relative improvement check (boxQP.c:85-86), skipped at iter 0 ---
        stop_rel = (c.it > 0) & (
            (c.oldvalue - c.value) < hyper.min_rel_improve * jnp.abs(c.oldvalue)
        )
        res = jnp.where(stop_rel, jnp.asarray(4, i32), res)
        oldvalue = jnp.where(stop_rel, c.oldvalue, c.value)
        live = res == 0

        # --- gradient & clamp detection (boxQP.c:95-117) ---
        grad = g + H @ c.x
        at_lower = (c.x <= lower) & (grad > 0.0)
        at_upper = (c.x >= upper) & (grad < 0.0)
        clamped_new = jnp.where(
            at_lower, jnp.asarray(1, i32), jnp.where(at_upper, jnp.asarray(2, i32), 0)
        )
        clamped = jnp.where(live, clamped_new, c.clamped)
        free = clamped == 0
        all_clamped = ~jnp.any(free)
        clamps_changed = jnp.any((clamped_new != 0) != (c.clamped != 0))
        gnorm2 = jnp.sum(jnp.where(free, grad * grad, 0.0))

        res = jnp.where(live & all_clamped, jnp.asarray(6, i32), res)
        live = res == 0

        # --- (re)factorize free-set Hessian (boxQP.c:129-146) ---
        need_factor = (c.it == 0) | clamps_changed
        inv_new, chol_ok = _masked_chol_inverse(H, free)
        do_factor = live & need_factor
        inv_h = jnp.where(do_factor & chol_ok, inv_new, c.inv_h)
        res = jnp.where(do_factor & ~chol_ok, jnp.asarray(-1, i32), res)
        live = res == 0

        # --- gradient tolerance (boxQP.c:148-150) ---
        res = jnp.where(
            live & (gnorm2 < hyper.min_grad * hyper.min_grad), jnp.asarray(5, i32), res
        )
        live = res == 0

        # --- search direction (boxQP.c:153-177) ---
        x_clamped_part = jnp.where(free, 0.0, c.x)
        grad_clamped = g + H @ x_clamped_part
        search = jnp.where(free, -(inv_h @ grad_clamped) - c.x, 0.0)
        sdotg = jnp.sum(search * grad)
        res = jnp.where(live & (sdotg >= 0.0), jnp.asarray(-2, i32), res)
        live = res == 0

        # --- Armijo backtracking (boxQP.c:198-227) ---
        def a_cond(a):
            step, _xc, _vc, done, failed = a
            return ~(done | failed)

        def a_body(a):
            step, _xc, _vc, _done, _failed = a
            xc = jnp.clip(c.x + step * search, lower, upper)
            vc = _quad_value(H, g, xc)
            accept = (vc - oldvalue) / (step * sdotg) >= hyper.armijo
            next_step = step * hyper.step_dec
            failed = ~accept & (next_step < hyper.min_step)
            return (
                jnp.where(accept, step, next_step),
                xc,
                vc,
                accept,
                failed,
            )

        a0 = (
            jnp.ones((), dtype),
            c.x,
            c.value,
            jnp.asarray(False),
            jnp.asarray(False),
        )
        _step, xc, vc, a_done, a_failed = lax.while_loop(a_cond, a_body, a0)
        res = jnp.where(live & a_failed, jnp.asarray(2, i32), res)
        accepted = live & a_done

        x = jnp.where(accepted, xc, c.x)
        value = jnp.where(accepted, vc, c.value)

        return _Carry(
            x=x,
            value=value,
            oldvalue=oldvalue,
            clamped=clamped,
            inv_h=inv_h,
            res=res,
            it=c.it + 1,
        )

    init = _Carry(
        x=x_init,
        value=value_init,
        oldvalue=jnp.zeros((), dtype),
        clamped=jnp.zeros((n,), i32),
        inv_h=jnp.zeros((n, n), dtype),
        res=jnp.asarray(0, i32),
        it=jnp.asarray(0, i32),
    )
    out = lax.while_loop(cond, body, init)
    # Loop exhausted without another exit => maxIter (boxQP.c:237)
    res = jnp.where(out.res == 0, jnp.asarray(1, jnp.int32), out.res)
    free = out.clamped == 0
    return BoxQPResult(
        x=out.x,
        res=res,
        clamped=out.clamped,
        free=free,
        inv_h_free=out.inv_h,
        n_free=jnp.sum(free.astype(jnp.int32)),
    )
