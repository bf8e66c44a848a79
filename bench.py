"""Benchmark: batched CarParking iLQG solves/s on one chip.

Reference baseline (BASELINE.md): the generated C solver runs the CarParking
example at 8 ms/iteration (``/root/reference/README.md:11``); at the
workload's 200-iteration budget that is 1.6 s per solve => 0.625 solves/s on
the author's machine, one instance per process.  ``vs_baseline`` is measured
solves/s divided by that 0.625 solves/s.

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

import argparse
import faulthandler
import json
import sys
import time

import numpy as np

# Watchdog traceback if the bench wedges (relay stalls).  The threshold must
# sit ABOVE any healthy first-run compile time so the recorded output tail
# stays clean (round 2's 480 s threshold fired during a slow-relay compile
# and polluted the scoreboard tail).
faulthandler.dump_traceback_later(1200, repeat=True, file=sys.stderr)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--T", type=int, default=500)
    ap.add_argument("--max-iter", type=int, default=200)
    ap.add_argument("--dtype", default=None, help="float32|float64 (default: by platform)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--unroll", type=int, default=1, help="horizon scan unroll")
    ap.add_argument(
        "--backpass", default=None,
        choices=["serial", "pallas", "fused"],
        help="backward-pass implementation (default: pallas on TPU — the "
        "streamed component-major bundle kernel; serial scan elsewhere). "
        "fused = derivs computed in-kernel (documented negative result). "
        "NB 'parallel' (associative-scan Riccati) is NOT offered here: it "
        "requires an unconstrained problem and this bench is the "
        "box-constrained CarParking workload — its A/B lives in "
        "scripts/bench_parallel_riccati.py",
    )
    ap.add_argument(
        "--linesearch", default=None, choices=["serial", "pallas"],
        help="line-search implementation (default: pallas fused rollout "
        "kernels on TPU; vmap-of-scan elsewhere)",
    )
    ap.add_argument(
        "--lam-retry", default="deferred", choices=["inline", "deferred"],
        help="lambda-escalation retry placement (A/B lever): deferred = "
        "one attempt per body call (default; wins at production batch), "
        "inline = reference's inner while around only the backward pass "
        "(see SolverOptions.lam_retry)",
    )
    ap.add_argument(
        "--shared-derivs", action="store_true",
        help="A/B lever: use the single-primal-trace derivative emitter "
        "instead of the default per-family one (measured 12x slower at "
        "emission, BASELINE.md round 4; affects pallas path only)",
    )
    ap.add_argument(
        "--compile-cache", action="store_true",
        help="enable the persistent XLA compile cache (slow on relayed "
        "TPU backends; see comment in main)",
    )
    ap.add_argument(
        "--inline-below", type=int, default=0,
        help="A/B lever: working-set widths <= this run chunk programs "
        "with lam_retry='inline' (reference inner-while retries; right "
        "for the compacted tail where the kernel is cheap and straggler "
        "lanes are retry-heavy).  0 = always deferred",
    )
    ap.add_argument(
        "--pipeline-depth", type=int, default=1,
        help="A/B lever: chunks enqueued ahead of the lagged active-count "
        "sync (StepwiseSolver pipeline_depth)",
    )
    ap.add_argument(
        "--compact-levels", type=int, default=4,
        help="A/B lever: max batch halvings of the working set",
    )
    ap.add_argument(
        "--min-compact", type=int, default=128,
        help="A/B lever: smallest compacted working-set width",
    )
    ap.add_argument(
        "--chunk", type=int, default=10,
        help="iterations per device call (bounds device-program duration; "
        "some TPU runtimes watchdog-kill minutes-long programs)",
    )
    ap.add_argument(
        "--mesh", type=int, default=0,
        help="shard the batch over an N-device mesh via shard_map (0 = no "
        "mesh).  Reports aggregate AND per-chip solves/s; the headline "
        "metric stays per-chip.",
    )
    ap.add_argument(
        "--no-staged-ls", action="store_true",
        help="disable the alpha[0] fast-path line search (A/B lever)",
    )
    ap.add_argument(
        "--no-precompile", action="store_true",
        help="skip the concurrent program precompile before the first run",
    )
    ap.add_argument(
        "--debug", type=int, default=0,
        help="solver debug_level (>=1 prints per-chunk status; costs one "
        "host sync per chunk inside the timed loop)",
    )
    ap.add_argument(
        "--artifact", default=None,
        help="AOT artifact path: load a prebuilt exported solver (written "
        "on first use; fixed batch baked in).  Runs the plain batched "
        "while_loop solver -- no stepwise chunking/compaction -- but with "
        "near-zero compile time on reuse.",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    if args.compile_cache:
        # NB: measured counterproductive on the axon-relayed TPU backend --
        # cache serialization stalls each program for minutes (first run
        # 376s WITH cache vs 39s without, identical code); off by default.
        try:
            jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception as e:  # config name drift across jax versions
            log(f"compile cache not enabled: {e}")

    platform = jax.devices()[0].platform
    dtype = args.dtype or ("float64" if platform == "cpu" else "float32")
    backpass = args.backpass or ("pallas" if platform == "tpu" else "serial")
    linesearch = args.linesearch or ("pallas" if platform == "tpu" else "serial")
    log(f"platform={platform} devices={jax.devices()} dtype={dtype} "
        f"backpass={backpass} linesearch={linesearch}")

    import ddp_generator_tpu as ddp
    from ddp_generator_tpu.models import car_parking

    problem = car_parking.car_parking()
    tolFun = 1e-7 if dtype == "float64" else 1e-5  # dtype-feasible tolerance
    options = ddp.SolverOptions(
        max_iter=args.max_iter, dtype=dtype, tolFun=tolFun,
        scan_unroll=args.unroll, backpass_method=backpass,
        linesearch_method=linesearch,
        linesearch_staged=not args.no_staged_ls,
        lam_retry=args.lam_retry,
        derivs_emitter="shared" if args.shared_derivs else "per-family",
        # debug_level 0: the per-chunk status line costs a host round trip
        # per chunk inside the TIMED loop -- dominated wall time on the
        # relayed backend (~0.2 s/chunk of pure sync latency).  Re-enable
        # with --debug for the trace.
        debug_level=args.debug,
    )
    mesh = None
    n_chips = 1
    if args.mesh:
        from ddp_generator_tpu.parallel.mesh import make_mesh

        devices = jax.devices()[: args.mesh]
        if len(devices) < args.mesh:
            log(f"only {len(devices)} devices available, want {args.mesh}")
            sys.exit(1)
        mesh = make_mesh(devices)
        n_chips = len(devices)
        log(f"mesh: {n_chips} devices via shard_map")
    solver = ddp.StepwiseSolver(problem, options, chunk=args.chunk,
                                mesh=mesh, inline_below=args.inline_below,
                                pipeline_depth=args.pipeline_depth,
                                compact_levels=args.compact_levels,
                                min_compact_batch=args.min_compact)

    p, x0, _ = car_parking.default_setup(T=args.T, seed=0)
    rng = np.random.default_rng(0)
    B = args.batch
    np_dtype = np.dtype(dtype)
    x0s = np.tile(np.asarray(x0, np_dtype), (B, 1))
    u0s = (0.1 * rng.standard_normal((B, args.T, 2))).astype(np_dtype)
    p = {k: np.asarray(v, np_dtype) for k, v in p.items()}

    if args.artifact:
        from ddp_generator_tpu import aot

        t0 = time.time()
        wrote = aot.save_solver(args.artifact, problem, options, args.T, p,
                                batch=B)
        log(f"artifact {'exported+written' if wrote else 'reused'} "
            f"({time.time()-t0:.1f}s): {args.artifact}")
        t0 = time.time()
        solver = aot.load_solver_file(args.artifact)
        log(f"artifact loaded in {time.time()-t0:.1f}s")
        args.no_precompile = True

    # Wedged-tunnel guard: the relay backend's first dispatch has measured
    # 3 s .. 980 s for identical code (BASELINE.md), and a wedged tunnel can
    # hang a trivial program for minutes while recovering on retry.  Probe
    # with a trivial dispatch in a SUBPROCESS (a hung in-process dispatch
    # cannot be cancelled), and wait+retry until the tunnel answers quickly
    # -- bounding the variance the timed section below inherits.
    if platform != "cpu":
        import subprocess
        probe = ("import jax, numpy, jax.numpy as jnp;"
                 "numpy.asarray(jnp.ones((128,128)) @ jnp.ones((128,128)))")
        for attempt in range(3):
            t0 = time.time()
            try:
                proc = subprocess.run([sys.executable, "-c", probe],
                                      timeout=120, capture_output=True)
                if proc.returncode == 0:
                    log(f"tunnel probe: {time.time()-t0:.1f}s")
                    break
                # A fast CRASH (connection refused, second-client TPU
                # acquisition failure) is exactly the broken state the
                # probe exists to catch -- do not mistake it for healthy.
                log(f"tunnel probe FAILED rc={proc.returncode} "
                    f"(attempt {attempt + 1}/3): "
                    f"{proc.stderr.decode(errors='replace')[-200:]}; "
                    "waiting 30s")
                time.sleep(30)
            except subprocess.TimeoutExpired:
                log(f"tunnel probe hung >120s (attempt {attempt + 1}/3); "
                    "waiting 30s for the relay to recover")
                time.sleep(30)

    # NB: np.asarray (not block_until_ready) is the sync point -- on relayed
    # TPU backends block_until_ready can return before execution finishes.
    t0 = time.time()
    if not args.no_precompile:
        # Compile init + every chunk specialization + finalize CONCURRENTLY
        # (the driver environment has shown 10x compile-time variance on the
        # relayed backend; overlapping the compiles bounds the damage).
        dt_pre = solver.precompile(x0s, u0s, p)
        log(f"concurrent precompile: {dt_pre:.1f}s")
    sol = solver(x0s, u0s, p)
    np.asarray(sol.cost)
    log(f"compile+first run: {time.time()-t0:.1f}s")

    times = []
    for r in range(args.repeats):
        t0 = time.time()
        sol = solver(x0s, u0s, p)
        np.asarray(sol.cost)
        times.append(time.time() - t0)
    dt = min(times)

    succ = np.asarray(sol.success)
    iters = np.asarray(sol.iterations)
    costs = np.asarray(sol.cost)
    status = np.asarray(sol.status)
    body_calls = np.asarray(sol.body_calls)
    stale_calls = np.asarray(sol.stale_calls)
    bp_retry_calls = np.asarray(sol.bp_retry_calls)
    # Split accounting: "solved" = hit a convergence tolerance (gradient or
    # tolFun, status 1/2); "exhausted" = iteration budget ran out (status 7).
    # sol.success alone (back-pass-done && iterations left, iLQG.c:367-378)
    # would count budget-exhausted lanes as successes.
    solved = np.isin(status, (1, 2))
    exhausted = status == 7
    stale_frac = stale_calls.sum() / max(body_calls.sum(), 1)
    retry_frac = bp_retry_calls.sum() / max(body_calls.sum(), 1)
    if args.lam_retry == "deferred" and args.inline_below == 0:
        # bp_retry_calls is a subset of stale_calls ONLY in pure deferred
        # mode; inline mode (and inline tail chunks under --inline-below)
        # counts inner-while kernel attempts instead -- not body calls --
        # so the split below would be garbage there.
        split = (f"(lambda-retry {retry_frac*100:.1f}% / LS-reject "
                 f"{(stale_frac-retry_frac)*100:.1f}%) ")
    else:
        split = (f"(kernel retry attempts incl. inline: "
                 f"{bp_retry_calls.sum()}) ")
    log(
        f"batch={B} wall={dt:.3f}s success={succ.mean()*100:.1f}% "
        f"solved={solved.mean()*100:.1f}% exhausted={exhausted.mean()*100:.1f}% "
        f"iters: mean={iters.mean():.1f} max={iters.max()} "
        f"body calls: mean={body_calls.mean():.1f} stale={stale_frac*100:.1f}% "
        + split +
        f"cost: mean={costs.mean():.4f} median={np.median(costs):.4f}"
    )

    solves_per_s = B / dt
    if n_chips > 1:
        log(f"aggregate: {solves_per_s:.1f} solves/s over {n_chips} chips "
            f"= {solves_per_s / n_chips:.1f} per chip")
    baseline_solves_per_s = 0.625  # 200 iter x 8 ms/iter (README.md:11)
    out = {
        "metric": "carparking_batched_solves_per_s_per_chip",
        "value": round(solves_per_s / n_chips, 3),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / n_chips / baseline_solves_per_s, 2),
        "solved_pct": round(float(solved.mean()) * 100, 2),
        "exhausted_pct": round(float(exhausted.mean()) * 100, 2),
    }
    if n_chips > 1:
        out["n_chips"] = n_chips
        out["aggregate_solves_per_s"] = round(solves_per_s, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
