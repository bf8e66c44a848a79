"""Fused Pallas line-search kernels vs the XLA path (interpret mode on CPU).

Covers pallas_math substitutions, the multi-alpha cost sweep + selected
rollout pair, and end-to-end solver equivalence with
``linesearch_method='pallas'``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ddp_generator_tpu as ddp
from ddp_generator_tpu.al import init_multipliers
from ddp_generator_tpu.derivs import calc_derivs
from ddp_generator_tpu.models import brachistochrone, car_parking
from ddp_generator_tpu.ops.backpass import back_pass
from ddp_generator_tpu.ops.linesearch import line_search
from ddp_generator_tpu.ops.pallas_math import asin, atan, atan2, pallas_safe
from ddp_generator_tpu.ops.pallas_rollout import pallas_line_search
from ddp_generator_tpu.solver import _boxqp_hyper


def test_pallas_math_substitutions():
    x = jnp.asarray(np.linspace(-0.999, 0.999, 2001))
    np.testing.assert_allclose(np.asarray(asin(x)), np.arcsin(x), atol=3e-8)
    y = jnp.asarray(np.linspace(-5, 5, 2001))
    np.testing.assert_allclose(np.asarray(atan(y)), np.arctan(y), atol=5e-8)
    np.testing.assert_allclose(
        np.asarray(atan2(y, x[::-1] * 3)), np.arctan2(y, x[::-1] * 3),
        atol=1e-7,
    )

    def fn(a):
        return jnp.arcsin(a) * jnp.arccos(a) + jnp.arctan2(a, 1.0 + a * a)

    got = pallas_safe(fn)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(fn(x)), atol=3e-7)


def _ls_inputs(problem, p, x0, T, B, dtype=jnp.float64, seed=0, u0s=None):
    """Realistic line-search inputs: derivs + backpass on the init rollout."""
    o = ddp.SolverOptions()
    p = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), p)
    rng = np.random.default_rng(seed)
    x0s = jnp.asarray(np.tile(np.asarray(x0), (B, 1)), dtype)
    if u0s is None:
        u0s = 0.1 * rng.standard_normal((B, T, problem.n_u))
    u0s = jnp.asarray(u0s, dtype)
    mult = init_multipliers(problem, T, dtype)
    one = jnp.asarray(1.0, dtype)

    from ddp_generator_tpu.ops.forward import forward_pass

    def one_lane(x0_, u0_):
        zl = jnp.zeros((T, problem.n_u), dtype)
        zL = jnp.zeros((T, problem.n_u, problem.n_x), dtype)
        r = forward_pass(problem, x0_, jnp.zeros((T + 1, problem.n_x), dtype),
                         u0_, zl, zL, jnp.zeros((), dtype), p,
                         mult.mu_le, mult.mu_li, mult.mu_fe, mult.mu_fi,
                         one, one)
        d = calc_derivs(problem, r.xs, r.us, p, mult.mu_le, mult.mu_li,
                        mult.mu_fe, mult.mu_fi, one, one, True)
        bp = back_pass(d, r.us, jnp.asarray(1.0, dtype), 1, True,
                       _boxqp_hyper(o))
        return r.xs, r.us, r.cost, bp.l, bp.L, bp.dV

    xs, us, cost, l, L, dV = jax.vmap(one_lane)(x0s, u0s)
    B_ = B
    mu_le = jnp.broadcast_to(mult.mu_le[None], (B_,) + mult.mu_le.shape)
    mu_li = jnp.broadcast_to(mult.mu_li[None], (B_,) + mult.mu_li.shape)
    mu_fe = jnp.broadcast_to(mult.mu_fe[None], (B_,) + mult.mu_fe.shape)
    mu_fi = jnp.broadcast_to(mult.mu_fi[None], (B_,) + mult.mu_fi.shape)
    ones = jnp.ones((B_,), dtype)
    return (x0s, xs, us, l, L, dV, cost, mu_le, mu_li, mu_fe, mu_fi,
            ones, ones)


@pytest.mark.parametrize("model", ["car", "brachi_hli"])
def test_pallas_line_search_matches_xla(model):
    """Accepted alpha and numbers agree with the vmapped XLA line search on a
    real (post-backpass) line-search problem, success path included."""
    if model == "car":
        problem = car_parking.car_parking()
        p, x0, _ = car_parking.default_setup(T=30)
    else:
        problem = brachistochrone.brachistochrone_hli()
        p, x0, u0 = brachistochrone.default_setup_hli(30)
    B, T = 4, 30
    p = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float64), p)
    u0s = None
    if model == "brachi_hli":
        # feasible descending-slope controls (the brachistochrone dynamics
        # need y decreasing; random u gives all-NaN rollouts = no acceptance)
        rng = np.random.default_rng(2)
        u0s = -np.abs(rng.uniform(0.5, 1.5, (B, T, 1)))
    args = _ls_inputs(problem, p, x0, T, B, u0s=u0s)
    alphas = tuple(ddp.DEFAULT_ALPHA)
    av = jnp.asarray(alphas, jnp.float64)

    ref = jax.vmap(
        lambda x0_, xs_, us_, l_, L_, dV_, c_, mle, mli, mfe, mfi, wl, wf:
        line_search(problem, av, x0_, xs_, us_, l_, L_, dV_, c_, 0.0, p,
                    mle, mli, mfe, mfi, wl, wf)
    )(*args)
    got = pallas_line_search(problem, alphas, *args[:7], 0.0, p, *args[7:],
                             interpret=True)

    assert bool(jnp.any(ref.success)), "fixture should exercise acceptance"
    np.testing.assert_array_equal(np.asarray(ref.success),
                                  np.asarray(got.success))
    np.testing.assert_array_equal(np.asarray(ref.alpha_index),
                                  np.asarray(got.alpha_index))
    np.testing.assert_allclose(np.asarray(ref.new_cost),
                               np.asarray(got.new_cost), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref.xs), np.asarray(got.xs),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.us), np.asarray(got.us),
                               atol=1e-5)


def test_time_blocked_rollout_matches_unblocked():
    """Grid time-blocking of the rollout kernels (S steps per grid
    iteration) is semantics-preserving: selection and trajectories match
    the unblocked kernel to fma-reassociation noise."""
    problem = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=30)
    B, T = 4, 30
    p = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float64), p)
    args = _ls_inputs(problem, p, x0, T, B)
    alphas = tuple(ddp.DEFAULT_ALPHA)

    ref = pallas_line_search(problem, alphas, *args[:7], 0.0, p, *args[7:],
                             interpret=True, time_block=1)
    for S in (5, 10):
        got = pallas_line_search(problem, alphas, *args[:7], 0.0, p,
                                 *args[7:], interpret=True, time_block=S)
        np.testing.assert_array_equal(np.asarray(ref.success),
                                      np.asarray(got.success))
        np.testing.assert_array_equal(np.asarray(ref.alpha_index),
                                      np.asarray(got.alpha_index))
        tol = dict(rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ref.new_cost),
                                   np.asarray(got.new_cost), **tol)
        np.testing.assert_allclose(np.asarray(ref.xs), np.asarray(got.xs),
                                   **tol)
        np.testing.assert_allclose(np.asarray(ref.us), np.asarray(got.us),
                                   **tol)


def test_batch_tiled_rollout_matches_untiled():
    """Batch tiling of the rollout kernels (grid (B//BT, N//S), added for
    B >= 16384 where whole-batch blocks exceed the scoped-VMEM cap) is
    semantics-preserving per batch tile."""
    problem = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=30)
    B, T = 4, 30
    p = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float64), p)
    args = _ls_inputs(problem, p, x0, T, B)
    alphas = tuple(ddp.DEFAULT_ALPHA)

    ref = pallas_line_search(problem, alphas, *args[:7], 0.0, p, *args[7:],
                             interpret=True)
    # B pads to 128 lanes inside; 64 and 32 exercise 2 and 4 batch tiles.
    for bt in (64, 32):
        got = pallas_line_search(problem, alphas, *args[:7], 0.0, p,
                                 *args[7:], interpret=True, batch_tile=bt)
        np.testing.assert_array_equal(np.asarray(ref.success),
                                      np.asarray(got.success))
        np.testing.assert_array_equal(np.asarray(ref.alpha_index),
                                      np.asarray(got.alpha_index))
        np.testing.assert_array_equal(np.asarray(ref.new_cost),
                                      np.asarray(got.new_cost))
        np.testing.assert_array_equal(np.asarray(ref.xs), np.asarray(got.xs))
        np.testing.assert_array_equal(np.asarray(ref.us), np.asarray(got.us))


def test_batch_tile_pickers_stay_lane_aligned():
    """Batch tiles must divide B AND be 128-lane multiples (Mosaic block
    constraint) -- plain halving produced illegal tiles for B = 128*odd
    (4480 -> 2240 = 17.5 lane tiles, a TPU compile failure invisible to
    interpret-mode tests)."""
    from ddp_generator_tpu.ops.pallas_backpass import _pick_blocks
    from ddp_generator_tpu.ops.pallas_rollout import _pick_rollout_blocks

    for B in (4480, 2048, 4096, 16384, 128 * 35, 128 * 7, 640):
        S, BT = _pick_rollout_blocks(500, B, 16, 0, 16, 48, 4)
        assert B % BT == 0
        assert BT % 128 == 0 or BT == B
        assert BT <= 4096
        S2, BT2 = _pick_blocks(500, B, 87, 4)
        assert B % BT2 == 0
        assert BT2 % 128 == 0 or BT2 == B
    # Small unpadded batches still run whole.
    S, BT = _pick_rollout_blocks(30, 8, 16, 0, 16, 48, 8)
    assert BT == 8


def test_pallas_line_search_pads_odd_batch():
    problem = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=20)
    B, T = 3, 20  # not a multiple of 128 -> lane padding path
    args = _ls_inputs(problem, p, x0, T, B)
    alphas = tuple(ddp.DEFAULT_ALPHA)
    got = pallas_line_search(problem, alphas, *args[:7], 0.0, p, *args[7:],
                             interpret=True)
    assert got.new_cost.shape == (B,)
    assert got.xs.shape == (B, T + 1, 4)


def test_solver_with_pallas_linesearch_end_to_end():
    problem = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=40)
    B, T = 4, 40
    rng = np.random.default_rng(0)
    x0s = np.tile(np.asarray(x0), (B, 1))
    u0s = 0.1 * rng.standard_normal((B, T, 2))
    s_ser = ddp.make_batched_solver(
        problem, ddp.SolverOptions(max_iter=30))(x0s, u0s, p)
    s_pal = ddp.make_batched_solver(
        problem, ddp.SolverOptions(max_iter=30, linesearch_method="pallas")
    )(x0s, u0s, p)
    assert np.all(np.asarray(s_pal.success))
    np.testing.assert_allclose(np.asarray(s_pal.cost), np.asarray(s_ser.cost),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s_pal.us), np.asarray(s_ser.us),
                               atol=2e-3)


def test_pallas_linesearch_batched_params_falls_back():
    """Per-lane params take the vmapped XLA fallback inside the custom_vmap
    rule -- results must match the serial method exactly."""
    problem = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=20)
    B, T = 3, 20
    rng = np.random.default_rng(1)
    x0s = np.tile(np.asarray(x0), (B, 1))
    u0s = 0.1 * rng.standard_normal((B, T, 2))
    pb = {k: np.tile(np.asarray(v, np.float64), (B,) + (1,) * np.ndim(v))
          for k, v in p.items()}
    s_ser = ddp.make_batched_solver(
        problem, ddp.SolverOptions(max_iter=20), batch_params=True
    )(x0s, u0s, pb)
    s_pal = ddp.make_batched_solver(
        problem, ddp.SolverOptions(max_iter=20, linesearch_method="pallas"),
        batch_params=True,
    )(x0s, u0s, pb)
    np.testing.assert_array_equal(np.asarray(s_pal.cost),
                                  np.asarray(s_ser.cost))


def test_bench_configuration_stepwise_pallas():
    """The exact bench.py configuration (StepwiseSolver + pallas backpass +
    pallas line search + compaction) at toy shape, vs the all-serial
    reference path."""
    problem = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=30)
    B, T = 8, 30
    rng = np.random.default_rng(7)
    x0s = np.tile(np.asarray(x0), (B, 1))
    u0s = 0.1 * rng.standard_normal((B, T, 2))
    o_ref = ddp.SolverOptions(max_iter=25)
    o_bench = ddp.SolverOptions(max_iter=25, backpass_method="pallas",
                                linesearch_method="pallas")
    want = ddp.make_batched_solver(problem, o_ref)(x0s, u0s, p)
    got = ddp.StepwiseSolver(problem, o_bench, chunk=4, compact_levels=2,
                             min_compact_batch=2)(x0s, u0s, p)
    assert np.all(np.asarray(got.success))
    np.testing.assert_allclose(np.asarray(got.cost), np.asarray(want.cost),
                               rtol=1e-5)


def test_staged_line_search_matches_unstaged_per_live_lane():
    """pallas_line_search_staged == pallas_line_search for live lanes, on
    both sides of the lax.cond: (a) all lanes accept alpha[0] (quick path),
    (b) some lane rejects alpha[0] (full path)."""
    from ddp_generator_tpu.ops.pallas_rollout import pallas_line_search_staged

    problem = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=30)
    B, T = 4, 30
    p = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float64), p)
    args = list(_ls_inputs(problem, p, x0, T, B))
    alphas = tuple(ddp.DEFAULT_ALPHA)

    ref = pallas_line_search(problem, alphas, *args[:7], 0.0, p, *args[7:],
                             interpret=True)
    alive = jnp.ones((B,), bool)
    got = pallas_line_search_staged(problem, alphas, *args[:7], 0.0, p,
                                    *args[7:], alive=alive, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.success),
                                  np.asarray(got.success))
    np.testing.assert_array_equal(np.asarray(ref.alpha_index),
                                  np.asarray(got.alpha_index))
    np.testing.assert_array_equal(np.asarray(ref.new_cost),
                                  np.asarray(got.new_cost))
    np.testing.assert_array_equal(np.asarray(ref.xs), np.asarray(got.xs))
    np.testing.assert_array_equal(np.asarray(ref.us), np.asarray(got.us))

    # Force the full path: poison lane 2's gains so alpha[0] overshoots
    # (huge step -> cost increase or NaN) and a smaller alpha is taken.
    l_bad = args[3].at[2].mul(200.0)
    args_b = args.copy()
    args_b[3] = l_bad
    ref_b = pallas_line_search(problem, alphas, *args_b[:7], 0.0, p,
                               *args_b[7:], interpret=True)
    got_b = pallas_line_search_staged(problem, alphas, *args_b[:7], 0.0, p,
                                      *args_b[7:], alive=alive,
                                      interpret=True)
    assert not bool(jnp.all(ref_b.alpha_index == 0)), \
        "fixture should force the full path"
    np.testing.assert_array_equal(np.asarray(ref_b.success),
                                  np.asarray(got_b.success))
    np.testing.assert_array_equal(np.asarray(ref_b.alpha_index),
                                  np.asarray(got_b.alpha_index))
    np.testing.assert_array_equal(np.asarray(ref_b.new_cost),
                                  np.asarray(got_b.new_cost))
    np.testing.assert_array_equal(np.asarray(ref_b.xs), np.asarray(got_b.xs))

    # Same poisoned batch but lane 2 dead: the quick path is taken and live
    # lanes still get identical results.
    alive_d = alive.at[2].set(False)
    got_d = pallas_line_search_staged(problem, alphas, *args_b[:7], 0.0, p,
                                      *args_b[7:], alive=alive_d,
                                      interpret=True)
    live = np.asarray(alive_d)
    np.testing.assert_array_equal(np.asarray(ref_b.alpha_index)[live],
                                  np.asarray(got_d.alpha_index)[live])
    np.testing.assert_array_equal(np.asarray(ref_b.new_cost)[live],
                                  np.asarray(got_d.new_cost)[live])
    np.testing.assert_array_equal(np.asarray(ref_b.xs)[live],
                                  np.asarray(got_d.xs)[live])

    # No live lane at all (a pure lambda-retry body call): both stages are
    # skipped and the result is a well-formed nominal pass-through -- the
    # solver masks every field, but shapes/dtypes/finiteness must hold.
    none_live = jnp.zeros((B,), bool)
    got_n = pallas_line_search_staged(problem, alphas, *args_b[:7], 0.0, p,
                                      *args_b[7:], alive=none_live,
                                      interpret=True)
    assert not np.asarray(got_n.success).any()
    assert (np.asarray(got_n.alpha_index) == len(alphas)).all()
    np.testing.assert_array_equal(np.asarray(got_n.xs), np.asarray(args_b[1]))
    np.testing.assert_array_equal(np.asarray(got_n.us), np.asarray(args_b[2]))
    np.testing.assert_array_equal(np.asarray(got_n.new_cost),
                                  np.asarray(args_b[6]))


def test_solver_staged_vs_unstaged_linesearch():
    """End-to-end: staged and unstaged pallas line search produce identical
    solves (per-lane results are scheduling-invariant)."""
    problem = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=40)
    B, T = 4, 40
    rng = np.random.default_rng(0)
    x0s = np.tile(np.asarray(x0), (B, 1))
    u0s = 0.1 * rng.standard_normal((B, T, 2))
    o = ddp.SolverOptions(max_iter=30, linesearch_method="pallas")
    s_st = ddp.make_batched_solver(problem, o)(x0s, u0s, p)
    s_un = ddp.make_batched_solver(
        problem, o.replace(linesearch_staged=False))(x0s, u0s, p)
    np.testing.assert_array_equal(np.asarray(s_st.cost),
                                  np.asarray(s_un.cost))
    np.testing.assert_array_equal(np.asarray(s_st.iterations),
                                  np.asarray(s_un.iterations))
    np.testing.assert_array_equal(np.asarray(s_st.us), np.asarray(s_un.us))
