"""boxQP tests: against brute-force/analytic solutions (boxQP.c semantics)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_generator_tpu.ops.boxqp import boxqp


def brute_force_box_qp(H, g, lower, upper, grid=400):
    """Dense grid search for small n (ground truth)."""
    n = len(g)
    axes = [np.linspace(max(lower[i], -10), min(upper[i], 10), grid) for i in range(n)]
    best, best_v = None, np.inf
    if n == 1:
        for x0 in axes[0]:
            x = np.array([x0])
            v = x @ g + 0.5 * x @ H @ x
            if v < best_v:
                best_v, best = v, x
    else:
        for x0 in axes[0]:
            # minimize analytically over x1 given x0, then clip
            x1 = -(g[1] + H[0, 1] * x0) / H[1, 1]
            x1 = np.clip(x1, lower[1], upper[1])
            x = np.array([x0, x1])
            v = x @ g + 0.5 * x @ H @ x
            if v < best_v:
                best_v, best = v, x
    return best, best_v


def run(H, g, lower, upper, x0=None):
    H = jnp.asarray(H, jnp.float64)
    g = jnp.asarray(g, jnp.float64)
    lower = jnp.asarray(lower, jnp.float64)
    upper = jnp.asarray(upper, jnp.float64)
    if x0 is None:
        x0 = jnp.zeros_like(g)
    return jax.jit(boxqp)(H, g, lower, upper, jnp.asarray(x0, jnp.float64))


def test_unconstrained_interior():
    H = np.array([[2.0, 0.3], [0.3, 1.5]])
    g = np.array([1.0, -2.0])
    res = run(H, g, [-10, -10], [10, 10])
    expect = -np.linalg.solve(H, g)
    np.testing.assert_allclose(res.x, expect, atol=1e-7)
    assert int(res.res) >= 1
    assert res.free.all()


def test_clamped_at_bound():
    H = np.array([[2.0, 0.0], [0.0, 2.0]])
    g = np.array([-10.0, 1.0])  # unconstrained x = [5, -0.5]
    res = run(H, g, [-1, -1], [1, 1])
    np.testing.assert_allclose(res.x, [1.0, -0.5], atol=1e-7)
    assert int(res.clamped[0]) == 2  # at upper
    assert bool(res.free[1])


def test_all_clamped():
    H = np.eye(2)
    g = np.array([-10.0, -10.0])
    res = run(H, g, [-1, -1], [1, 1], x0=[1.0, 1.0])
    assert int(res.res) == 6  # allClamped (boxQP.c:125-126)
    np.testing.assert_allclose(res.x, [1.0, 1.0])


def test_non_pd_free_hessian_fails():
    H = np.array([[1.0, 0.0], [0.0, -1.0]])
    g = np.array([1.0, 1.0])
    res = run(H, g, [-10, -10], [10, 10])
    assert int(res.res) == -1  # Cholesky failed (boxQP.c:141-143)


def test_infinite_bounds():
    H = np.array([[3.0, 0.5], [0.5, 2.0]])
    g = np.array([0.7, -1.3])
    res = run(H, g, [-np.inf, -np.inf], [np.inf, np.inf])
    np.testing.assert_allclose(res.x, -np.linalg.solve(H, g), atol=1e-7)


@pytest.mark.parametrize("seed", range(8))
def test_random_vs_brute_force(seed):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((2, 2))
    H = A @ A.T + 0.5 * np.eye(2)
    g = rng.standard_normal(2) * 2
    lower = np.array([-0.8, -0.6])
    upper = np.array([0.5, 0.9])
    res = run(H, g, lower, upper, x0=rng.standard_normal(2))
    xb, vb = brute_force_box_qp(H, g, lower, upper)
    v = float(res.x @ jnp.asarray(g) + 0.5 * res.x @ jnp.asarray(H) @ res.x)
    assert v <= vb + 1e-4
    assert int(res.res) >= 1


def test_masked_inverse_matches_submatrix():
    rng = np.random.default_rng(3)
    A = rng.standard_normal((3, 3))
    H = A @ A.T + np.eye(3)
    # force x[1] clamped at upper with negative gradient pull
    g = np.array([0.1, -50.0, 0.2])
    res = run(H, g, [-1, -1, -1], [1, 1, 1])
    free = np.asarray(res.free)
    assert free.tolist() == [True, False, True]
    sub = np.linalg.inv(H[np.ix_([0, 2], [0, 2])])
    got = np.asarray(res.inv_h_free)[np.ix_([0, 2], [0, 2])]
    np.testing.assert_allclose(got, sub, atol=1e-9)
    assert np.all(np.asarray(res.inv_h_free)[1, :] == 0)
    assert np.all(np.asarray(res.inv_h_free)[:, 1] == 0)


def test_vmap_batch():
    rng = np.random.default_rng(0)
    B = 16
    As = rng.standard_normal((B, 2, 2))
    Hs = np.einsum("bij,bkj->bik", As, As) + np.eye(2)
    gs = rng.standard_normal((B, 2))
    lo = np.full((B, 2), -1.0)
    up = np.full((B, 2), 1.0)
    x0 = np.zeros((B, 2))
    out = jax.jit(jax.vmap(boxqp, in_axes=(0, 0, 0, 0, 0)))(
        jnp.asarray(Hs), jnp.asarray(gs), jnp.asarray(lo), jnp.asarray(up),
        jnp.asarray(x0),
    )
    for b in range(B):
        single = run(Hs[b], gs[b], lo[b], up[b])
        np.testing.assert_allclose(out.x[b], single.x, atol=1e-9)
        assert int(out.res[b]) == int(single.res)


def test_enumerate_matches_newton():
    """Exact active-set enumeration finds the same optimum as the faithful
    projected-Newton iteration (convex QPs)."""
    from ddp_generator_tpu.ops.boxqp import boxqp_enumerate, boxqp_newton

    rng = np.random.default_rng(7)
    for n in (1, 2, 3):
        for trial in range(20):
            A = rng.standard_normal((n, n))
            H = jnp.asarray(A @ A.T + 0.3 * np.eye(n))
            g = jnp.asarray(rng.standard_normal(n))
            lo = jnp.asarray(np.sort(rng.standard_normal(n) - 0.5))
            up = jnp.asarray(np.asarray(lo) + np.abs(rng.standard_normal(n)) + 0.1)
            x0 = jnp.asarray(rng.standard_normal(n))
            r_new = boxqp_newton(H, g, lo, up, x0)
            r_enu = boxqp_enumerate(H, g, lo, up)
            assert int(r_enu.res) >= 1
            np.testing.assert_allclose(r_enu.x, r_new.x, atol=1e-6)
            # clamp sets agree away from degenerate boundaries
            if np.all(np.abs(np.asarray(r_new.x) - np.asarray(lo)) > 1e-9) or True:
                np.testing.assert_array_equal(
                    np.asarray(r_enu.free), np.asarray(r_new.free)
                )


def test_enumerate_infinite_bounds_and_nonpd():
    from ddp_generator_tpu.ops.boxqp import boxqp_enumerate

    H = jnp.asarray([[3.0, 0.5], [0.5, 2.0]])
    g = jnp.asarray([0.7, -1.3])
    inf = jnp.asarray([np.inf, np.inf])
    r = boxqp_enumerate(H, g, -inf, inf)
    np.testing.assert_allclose(r.x, -np.linalg.solve(np.asarray(H), np.asarray(g)), atol=1e-7)
    # indefinite H -> -1 like the reference's Cholesky failure
    Hbad = jnp.asarray([[1.0, 0.0], [0.0, -1.0]])
    r = boxqp_enumerate(Hbad, g, -inf, inf)
    assert int(r.res) == -1


def test_boxqp_hyper_auto_sentinel():
    """'auto' resolves the boxQP tolerances per dtype; explicit user floats
    are used verbatim (no value-equality trap on the float64 defaults)."""
    import ddp_generator_tpu as ddp
    from ddp_generator_tpu.solver import _boxqp_hyper

    h64 = _boxqp_hyper(ddp.SolverOptions(dtype="float64"))
    assert h64.min_grad == 1e-8 and h64.min_rel_improve == 1e-8
    h32 = _boxqp_hyper(ddp.SolverOptions(dtype="float32"))
    assert h32.min_grad == 1e-5 and h32.min_rel_improve == 1e-6
    # A user deliberately asking for 1e-8 in float32 gets 1e-8.
    h32x = _boxqp_hyper(
        ddp.SolverOptions(dtype="float32", boxqp_min_grad=1e-8,
                          boxqp_min_rel_improve=1e-8)
    )
    assert h32x.min_grad == 1e-8 and h32x.min_rel_improve == 1e-8
    import pytest as _pytest
    with _pytest.raises(ddp.OptionError):
        ddp.SolverOptions(boxqp_min_grad="bogus")
    with _pytest.raises(ddp.OptionError):
        ddp.SolverOptions(boxqp_min_grad=-1.0)


def test_kernel_backpass_rejects_unsupported_boxqp_options():
    """The Pallas/fused kernels' in-kernel boxQP never consumes
    use_mod_chol or the projected-Newton iteration; identical options must
    not silently mean different algorithms at B=1 vs B>1 (boxQP.c:69-72)."""
    import pytest as _pytest

    import ddp_generator_tpu as ddp

    for method in ("pallas", "fused"):
        with _pytest.raises(ddp.OptionError):
            ddp.SolverOptions(backpass_method=method, use_mod_chol=True)
        with _pytest.raises(ddp.OptionError):
            ddp.SolverOptions(backpass_method=method, boxqp_method="newton")
    # Still allowed: serial keeps both; kernels keep auto/enumerate.
    ddp.SolverOptions(backpass_method="serial", use_mod_chol=True,
                      boxqp_method="newton")
    ddp.SolverOptions(backpass_method="pallas", boxqp_method="enumerate")
