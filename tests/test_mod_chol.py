"""Schnabel-Eskow modified Cholesky tests.

The jit/vmap-safe masked implementation (ops/chol.py) is cross-checked
against an independent straight-line Python implementation of the same
published algorithm (Schnabel & Eskow 1990, as organized in the reference's
``cholesky.c:129-287``), plus algebraic properties.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_generator_tpu.ops.chol import mod_chol, mod_chol_perturb

EPS = 2.22044604925031e-16
TAU = EPS ** (1.0 / 3.0)
TAUBAR = EPS ** (2.0 / 3.0)
MU = 0.1


def _swap(A, P, i, j):
    A[[i, j], :] = A[[j, i], :]
    A[:, [i, j]] = A[:, [j, i]]
    P[i], P[j] = P[j], P[i]


def _chol_step(A, j):
    n = len(A)
    d = A[j, j]
    for i in range(j + 1, n):
        for k in range(j + 1, n):
            A[i, k] -= A[j, i] * A[j, k] / d


def mod_chol_oracle(A_in):
    """Plain-Python Schnabel-Eskow (dense, no masking) -- test oracle."""
    A = np.array(A_in, dtype=np.float64)
    n = len(A)
    P = list(range(n))
    E = np.zeros(n)
    deltaprev = 0.0
    if n == 1:
        a = A[0, 0]
        delta = max(TAUBAR * abs(a) - a, 0.0)
        if a == 0.0:
            delta = TAUBAR
        return np.array([delta]), P, np.array([delta]), delta

    gamma = np.max(np.abs(np.diag(A)))
    phaseone = bool(np.all(np.diag(A) >= 0.0))
    j = 0
    while j < n and phaseone:
        sub = np.diag(A)[j:]
        tmp_max = sub.max()
        idx = j + int(sub.argmax())
        tmp_min = sub.min()
        if tmp_max < TAUBAR * gamma or tmp_min < -MU * tmp_max:
            phaseone = False
            break
        _swap(A, P, j, idx)
        if j < n - 1:
            schur = min(
                A[i, i] - A[j, i] ** 2 / A[j, j] for i in range(j + 1, n)
            )
            tmp_min = min(0.0, schur)
        else:
            tmp_min = 0.0
        if tmp_min < -MU * gamma:
            phaseone = False
            break
        _chol_step(A, j)
        j += 1

    if not phaseone and j == n - 1:
        delta = -A[-1, -1] + max(TAU * A[-1, -1] / (TAU - 1.0), TAUBAR * gamma)
        A[-1, -1] += delta
        E[-1] = delta
        deltaprev = delta
    elif not phaseone:
        k = j - 1
        g = np.zeros(n)
        for i in range(k + 1, n):
            g[i] = A[i, i] - sum(
                abs(A[min(i, q), max(i, q)]) for q in range(k + 1, n) if q != i
            )
        for j2 in range(k + 1, n - 2):
            idx = j2 + int(np.argmax(g[j2:]))
            _swap(A, P, j2, idx)
            g[j2], g[idx] = g[idx], g[j2]
            normj = sum(abs(A[j2, i]) for i in range(j2 + 1, n))
            delta = max(0.0, max(normj, TAUBAR * gamma) - A[j2, j2], deltaprev)
            if delta > 0:
                A[j2, j2] += delta
                deltaprev = delta
                E[j2] = delta
            if A[j2, j2] != normj:
                tmp = 1.0 - normj / A[j2, j2]
                for i in range(j2 + 1, n):
                    g[i] += abs(A[j2, i]) * tmp
            _chol_step(A, j2)
        # final 2x2
        a00, a01, a11 = A[n - 2, n - 2], A[n - 2, n - 1], A[n - 1, n - 1]
        disc = np.sqrt((a00 - a11) ** 2 + 4.0 * a01 * a01)
        lam_hi = 0.5 * ((a00 + a11) + disc)
        lam_lo = 0.5 * ((a00 + a11) - disc)
        delta = max(
            max(0.0, -lam_lo + max(TAU * (lam_hi - lam_lo) / (1.0 - TAU),
                                   TAUBAR * gamma)),
            deltaprev,
        )
        if delta > 0:
            A[n - 2, n - 2] += delta
            A[n - 1, n - 1] += delta
            deltaprev = delta
            E[n - 2] = delta
            E[n - 1] = delta

    e_scattered = np.zeros(n)
    for i in range(n):
        e_scattered[P[i]] += E[i]
    return e_scattered, P, E, deltaprev


def _random_sym(rng, n, kind):
    A = rng.standard_normal((n, n))
    A = 0.5 * (A + A.T)
    if kind == "pd":
        A = A @ A.T + n * np.eye(n)
    elif kind == "neardef":
        w, V = np.linalg.eigh(A)
        w[0] = -abs(w[0]) * 0.01
        A = (V * w) @ V.T
        A = 0.5 * (A + A.T)
    return A


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5])
@pytest.mark.parametrize("kind", ["pd", "indef", "neardef"])
def test_matches_oracle(n, kind):
    rng = np.random.default_rng(n * 17 + hash(kind) % 100)
    jit_mc = jax.jit(mod_chol)
    for _ in range(12):
        A = _random_sym(rng, n, kind)
        got = jit_mc(jnp.asarray(A))
        e_ref, P_ref, E_ref, dp_ref = mod_chol_oracle(A)
        np.testing.assert_allclose(
            np.asarray(got.e_scattered), e_ref, rtol=1e-10, atol=1e-12,
            err_msg=f"A=\n{A}",
        )
        np.testing.assert_allclose(float(got.delta_prev), dp_ref, rtol=1e-10,
                                   atol=1e-12)


@pytest.mark.parametrize("n", [2, 3, 4])
def test_perturbed_matrix_is_psd(n):
    rng = np.random.default_rng(5)
    for _ in range(20):
        A = _random_sym(rng, n, "indef")
        H_psd, changed = mod_chol_perturb(jnp.asarray(A))
        w = np.linalg.eigvalsh(np.asarray(H_psd))
        assert w.min() >= -1e-8, (A, w)


def test_pd_matrix_unchanged():
    rng = np.random.default_rng(1)
    A = _random_sym(rng, 3, "pd")
    H, changed = mod_chol_perturb(jnp.asarray(A))
    assert not bool(changed)
    np.testing.assert_array_equal(np.asarray(H), A)


def test_vmap_batch():
    rng = np.random.default_rng(2)
    As = np.stack([_random_sym(rng, 3, k) for k in ["pd", "indef", "neardef"]])
    out = jax.jit(jax.vmap(mod_chol))(jnp.asarray(As))
    for b in range(3):
        e_ref, _, _, dp_ref = mod_chol_oracle(As[b])
        np.testing.assert_allclose(np.asarray(out.e_scattered[b]), e_ref,
                                   rtol=1e-10, atol=1e-12)
