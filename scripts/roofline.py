"""Speed-of-light / roofline analysis of the solver's hot ops.

For each hot op at the bench shape (CarParking, B=2048, N=500, f32,
FULL_DDP) this script reports:

* bytes moved through HBM (analytic, from the op's array traffic),
* FLOPs + bytes as estimated by XLA's own cost model where available
  (``compiled.cost_analysis()``; Pallas kernels are opaque custom calls, so
  their traffic is computed analytically),
* transcendental counts for the rollout kernels (the CarParking dynamics
  evaluate sin/cos/tan/atan per step),
* the implied floor in ms against MEASURED machine ceilings (copy
  bandwidth, elementwise FMA rate, transcendental rate -- measured on the
  live chip by this script rather than taken from datasheets, so the
  numbers hold for whatever backend actually runs the bench),
* the measured time of the op (same harness as scripts/profile_parts.py).

Output: a Markdown table + verdict paragraph on stderr/stdout for
BASELINE.md.  Run on the TPU: ``python scripts/roofline.py [B] [K]``.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_enable_x64", True)

    import ddp_generator_tpu as ddp
    from ddp_generator_tpu import solver as slv
    from ddp_generator_tpu.models import car_parking

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    T = 500
    on_tpu = jax.default_backend() == "tpu"
    dtype = "float32" if on_tpu else "float64"
    fsize = 4 if dtype == "float32" else 8
    np_dtype = np.dtype(dtype)
    log(f"backend={jax.default_backend()} B={B} N={T} dtype={dtype}")

    # ---------------- machine ceilings (measured) ----------------
    # NB: operands enter as jit ARGUMENTS -- closed-over constants let XLA
    # unroll + constant-fold the whole timing loop away.
    # The ceiling probes use their OWN rep count: each timed call pays one
    # host<->device sync (~25 ms on relayed backends), so at small K the
    # probe measures tunnel latency, not the chip (observed: 80 GB/s
    # "bandwidth" at K=20 and ops measuring below their floors).
    KC = max(K, 400)

    def timeK(fn, reps=3, k=None):
        out = fn()
        np.asarray(out)
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            np.asarray(out)
            best = min(best, time.time() - t0)
        return best / (K if k is None else k)

    rng0 = np.random.default_rng(0)

    # HBM copy bandwidth: K dependent copies of a big array (read+write).
    big = jnp.asarray(
        rng0.standard_normal(64 * 1024 * 1024 // fsize), jnp.dtype(dtype)
    )  # 64 MB

    # NB: return a SCALAR -- returning the array itself drags 64 MB back
    # through the relayed backend on every np.asarray sync, and that
    # transfer (not the chip) dominates the measurement.
    @jax.jit
    def copy_chain(a0):
        def body(i, a):
            return a + 1.0  # read + write 64 MB
        return lax.fori_loop(0, KC, body, a0).sum()

    t_copy = timeK(lambda: copy_chain(big), k=KC)
    bw = 2 * big.size * fsize / t_copy  # bytes/s (read+write)
    log(f"measured HBM stream bandwidth: {bw/1e9:.0f} GB/s")

    # Elementwise FMA rate: C chained multiply-adds per element per pass.
    C = 64
    vec = jnp.asarray(
        rng0.standard_normal(16 * 1024 * 1024 // fsize), jnp.dtype(dtype)
    )

    @jax.jit
    def fma_chain(v0):
        def body(i, a):
            x = a
            for _ in range(C):
                x = x * 1.000000119 + 1e-7
            return x
        return lax.fori_loop(0, KC, body, v0).sum()

    t_fma = timeK(lambda: fma_chain(vec), k=KC)
    fma_rate = 2 * C * vec.size / t_fma  # FLOP/s (mul+add = 2)
    log(f"measured elementwise VPU rate: {fma_rate/1e12:.2f} TFLOP/s")

    # Transcendental rate (tan+atan pair, the car dynamics' staples).
    CT = 8

    @jax.jit
    def trans_chain(v0):
        def body(i, a):
            x = a
            for _ in range(CT):
                x = jnp.arctan(jnp.tan(x * 0.999))
            return x
        return lax.fori_loop(0, KC, body, v0).sum()

    t_trans = timeK(lambda: trans_chain(vec * 0.5), k=KC)
    trans_rate = 2 * CT * vec.size / t_trans  # transcendental-evals/s
    log(f"measured transcendental rate: {trans_rate/1e9:.1f} Geval/s "
        f"(tan/atan class)")

    # ---------------- op setup (bench shape) ----------------
    problem = car_parking.car_parking()
    o = ddp.SolverOptions(max_iter=200, dtype=dtype, tolFun=1e-5,
                          backpass_method="pallas" if on_tpu else "serial",
                          linesearch_method="pallas" if on_tpu else "serial",
                          debug_level=0)
    p, x0, _ = car_parking.default_setup(T=T, seed=0)
    rng = np.random.default_rng(0)
    x0s = np.tile(np.asarray(x0, np_dtype), (B, 1))
    u0s = (0.1 * rng.standard_normal((B, T, 2))).astype(np_dtype)
    p = {k: jnp.asarray(np.asarray(v, np_dtype)) for k, v in p.items()}

    init_fn, body_fn, _fin = slv._make_parts(problem, o)
    init = jax.jit(jax.vmap(init_fn, in_axes=(0, 0, None)))
    carry = init(x0s, u0s, p)
    np.asarray(carry.cost)
    mult, wl, wf, lam = carry.mult, carry.w_pen_l, carry.w_pen_f, carry.lam

    n_x, n_u = problem.n_x, problem.n_u
    TX, TU = n_x * (n_x + 1) // 2, n_u * (n_u + 1) // 2
    C_packed = (
        n_x * n_x + n_x * n_u + n_x + n_u + TX + TU + n_x * n_u
        + n_x * TX + n_x * TU + n_x * n_x * n_u  # fxx/fuu packed + fxu
        + 2 * n_u + 2 * n_u * n_x + 2 * n_u
    )
    bundle_bytes = C_packed * T * B * fsize
    log(f"packed bundle: {C_packed} comps/step = {bundle_bytes/1e9:.2f} GB")

    from ddp_generator_tpu.ops.cm_derivs import (
        batched_calc_derivs_cm, cm_derivs_back_pass,
    )
    from ddp_generator_tpu.ops.pallas_rollout import (
        pallas_line_search, pallas_line_search_staged,
    )

    interp = not on_tpu
    rows = []

    def bench_op(name, make_step, traffic_bytes, flops=None, trans=None,
                 notes=""):
        """make_step() -> jitted fn running the op K times (data-dep)."""
        fn = make_step()
        t = timeK(fn) * 1e3  # ms
        floor_bw = traffic_bytes / bw * 1e3
        floors = [floor_bw]
        if flops:
            floors.append(flops / fma_rate * 1e3)
        if trans:
            floors.append(trans / trans_rate * 1e3)
        floor = max(floors)
        bound = ["HBM", "VPU-fma", "VPU-trans"][int(np.argmax(floors))]
        rows.append((name, traffic_bytes / 1e9, flops or 0, trans or 0,
                     floor, t, t / floor, bound, notes))
        log(f"{name:34s} {t:7.2f} ms   floor {floor:6.2f} ms "
            f"({bound})  ratio {t/floor:5.1f}x")
        return t

    dt = jnp.dtype(dtype)

    # ---- calc_derivs (packed CM emission) ----
    def mk_derivs():
        def fn():
            def body(i, acc):
                sd, fcx, fcxx, ok = batched_calc_derivs_cm(
                    problem, carry.xs + 1e-30 * acc[:, None, None],
                    carry.us, p, mult.mu_le, mult.mu_li, mult.mu_fe,
                    mult.mu_fi, wl, wf, o.full_ddp)
                # Checksum EVERY bundle leaf: consuming only fcx lets XLA
                # dead-code-eliminate the bundle emission entirely (measured
                # 0.48 ms, below the 0.79 ms write floor -- a giveaway).
                # Cost: one extra read pass over the bundle, reflected in
                # the traffic estimate below.
                chk = sum(
                    a.sum() for a in jax.tree_util.tree_leaves(sd)
                ) + fcxx.sum()
                return acc + (fcx[0] + chk) * 1e-30
            return lax.fori_loop(0, K, body, jnp.zeros((B,), dt))
        return jax.jit(fn)

    # XLA cost analysis for the derivs program
    lowered = jax.jit(
        lambda xs: batched_calc_derivs_cm(
            problem, xs, carry.us, p, mult.mu_le, mult.mu_li, mult.mu_fe,
            mult.mu_fi, wl, wf, o.full_ddp)
    ).lower(carry.xs)
    try:
        ca = lowered.compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        derivs_flops = float(ca.get("flops", 0.0))
        derivs_bytes = float(ca.get("bytes accessed", 0.0))
        log(f"XLA cost model (derivs): {derivs_flops/1e9:.1f} GFLOP, "
            f"{derivs_bytes/1e9:.2f} GB accessed")
    except Exception as e:
        log(f"cost_analysis unavailable: {e}")
        derivs_flops = None
        derivs_bytes = 0.0
    t_derivs = bench_op(
        "calc_derivs (packed CM emission)", mk_derivs,
        traffic_bytes=max(2 * bundle_bytes, derivs_bytes),
        flops=derivs_flops,
        notes="bundle written once + checksum read",
    )

    # ---- full derivs+backpass (production path) ----
    def mk_dbp():
        def fn():
            def body(i, acc):
                bp, ok = cm_derivs_back_pass(
                    problem, carry.xs + 1e-30 * acc[:, None, None],
                    carry.us, mult.mu_le, mult.mu_li, mult.mu_fe,
                    mult.mu_fi, wl, wf,
                    jnp.broadcast_to(lam, (B,)), p,
                    o.regType, o.full_ddp, interpret=interp)
                return acc + bp.g_norm * 1e-30
            return lax.fori_loop(0, K, body, jnp.zeros((B,), dt))
        return jax.jit(fn)

    # backpass kernel traffic: bundle read + l/L write (+ us read)
    bp_bytes = bundle_bytes + (n_u + n_u * n_x + n_u) * T * B * fsize
    t_dbp = bench_op(
        "derivs + pallas backpass (fused path)", mk_dbp,
        traffic_bytes=bundle_bytes + bp_bytes,
        flops=derivs_flops,
        notes="bundle written once, read once",
    )

    bp0_l = jnp.zeros((B, T, n_u), dt)
    bp0_L = jnp.zeros((B, T, n_u, n_x), dt)
    bp0_dV = jnp.zeros((B, 2), dt)
    alphas = tuple(float(a) for a in o.alpha)
    A = len(alphas)
    wl_b = jnp.broadcast_to(wl, (B,))
    wf_b = jnp.broadcast_to(wf, (B,))

    # transcendentals per rollout step per lane for the car model:
    # f: sin/cos/tan/atan ~ 6 evals; clampU h: ~2.
    TRANS_PER_STEP = 8.0

    # ---- line-search sweep+selected (unstaged) ----
    def mk_ls(staged, alive):
        def call(acc):
            args = (problem, alphas, carry.xs[:, 0], carry.xs,
                    carry.us + 1e-30 * acc[:, None, None], bp0_l, bp0_L,
                    bp0_dV, carry.cost, o.zMin, p, mult.mu_le, mult.mu_li,
                    mult.mu_fe, mult.mu_fi, wl_b, wf_b)
            if staged:
                return pallas_line_search_staged(
                    *args, alive=alive, interpret=interp)
            return pallas_line_search(*args, interpret=interp)

        def fn():
            def body(i, acc):
                ls = call(acc)
                return acc + ls.new_cost * 1e-30
            return lax.fori_loop(0, K, body, jnp.zeros((B,), dt))
        return lambda: jax.jit(fn)

    ls_traffic = (
        # sweep reads: xnom, unom, l, L per step; writes (A,B) costs
        (n_x + n_u + n_u + n_u * n_x) * T * B * fsize
        # selected rollout: same reads + xs/us write
        + (2 * (n_x + n_u) + n_u * n_x + n_x) * T * B * fsize
    )
    ls_trans = TRANS_PER_STEP * T * B * (A + 1)
    t_ls = bench_op(
        "pallas line search (sweep+selected)", mk_ls(False, None),
        traffic_bytes=ls_traffic, trans=ls_trans,
        notes=f"{A} alphas + 1 selected rollout",
    )

    alive_all = jnp.zeros((B,), bool)  # no live lane rejects -> quick path
    ls1_traffic = (2 * (n_x + n_u) + n_u * n_x + n_x) * T * B * fsize
    t_ls1 = bench_op(
        "staged line search (alpha0 fast path)", mk_ls(True, alive_all),
        traffic_bytes=ls1_traffic, trans=TRANS_PER_STEP * T * B,
        notes="quick path: 1 rollout instead of 9",
    )

    # ---------------- report ----------------
    print("\n| op | traffic GB | floor ms | measured ms | x-of-floor | bound |")
    print("|---|---|---|---|---|---|")
    for (name, gb, fl, tr, floor, t, ratio, bound, notes) in rows:
        print(f"| {name} | {gb:.2f} | {floor:.2f} | {t:.2f} | "
              f"{ratio:.1f}x | {bound} ({notes}) |")
    body_est = t_dbp + t_ls1 + 0.6
    body_worst = t_dbp + t_ls + 0.6
    print(f"\nceilings: HBM {bw/1e9:.0f} GB/s, VPU {fma_rate/1e12:.2f} "
          f"TFLOP/s, transcendental {trans_rate/1e9:.1f} Geval/s")
    print(f"estimated body: {body_est:.1f} ms (alpha0 iters) .. "
          f"{body_worst:.1f} ms (full-sweep iters)")
    print(f"implied solves/s at 93 iters/solve, B={B}: "
          f"{B / (93 * body_est * 1e-3):.0f} .. "
          f"{B / (93 * body_worst * 1e-3):.0f}")


if __name__ == "__main__":
    main()
