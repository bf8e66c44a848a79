"""Long-horizon benchmark: serial vs associative-scan Riccati backward pass.

SURVEY.md section 5 (long-context row) names parallel-scan Riccati
(arXiv:1809.06360, arXiv:1407.6898) as the long-horizon upgrade path; this
script measures whether it earns its keep on the current backend.  Scope
matches ops/parallel_riccati.py: unconstrained problem, full_ddp=False.

Usage: python scripts/bench_parallel_riccati.py [N ...] [--batch B]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("horizons", nargs="*", type=int,
                    default=[500, 2000, 8000])
    ap.add_argument("--batch", type=int, default=0,
                    help="also run batched (vmap) comparisons at this size")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    import ddp_generator_tpu as ddp
    from ddp_generator_tpu.al import init_multipliers
    from ddp_generator_tpu.derivs import calc_derivs
    from ddp_generator_tpu.models import brachistochrone
    from ddp_generator_tpu.ops.backpass import back_pass
    from ddp_generator_tpu.ops.parallel_riccati import parallel_back_pass
    from ddp_generator_tpu.solver import _boxqp_hyper

    platform = jax.default_backend()
    dtype = "float64" if platform == "cpu" else "float32"
    print(f"backend={platform} dtype={dtype}", flush=True)

    prob = brachistochrone.brachistochrone()
    o = ddp.SolverOptions(full_ddp=False, dtype=dtype)
    hyper = _boxqp_hyper(o)

    def setup(N):
        p, x0, u0 = brachistochrone.default_setup(N)
        p = {k: jnp.asarray(np.asarray(v), jnp.dtype(dtype)) for k, v in p.items()}
        xs = jnp.zeros((N + 1, 1), jnp.dtype(dtype)).at[:, 0].set(
            jnp.linspace(0.0, -4.0, N + 1))
        us = jnp.asarray(np.asarray(u0), jnp.dtype(dtype))
        mult = init_multipliers(prob, N, jnp.dtype(dtype))
        one = jnp.asarray(1.0, jnp.dtype(dtype))
        derivs = jax.jit(lambda xs, us: calc_derivs(
            prob, xs, us, p, mult.mu_le, mult.mu_li, mult.mu_fe, mult.mu_fi,
            one, one, False))(xs, us)
        return derivs, us

    def bench(fn, *a):
        out = fn(*a)
        np.asarray(out.g_norm)
        times = []
        for _ in range(5):
            t0 = time.time()
            out = fn(*a)
            np.asarray(out.g_norm)
            times.append(time.time() - t0)
        return min(times), out

    lam = jnp.asarray(0.0, jnp.dtype(dtype))
    for N in args.horizons:
        derivs, us = setup(N)
        serial = jax.jit(lambda d, u: back_pass(d, u, lam, 1, False, hyper))
        par = jax.jit(lambda d, u: parallel_back_pass(d, u, lam, 1, hyper))
        ts, outs = bench(serial, derivs, us)
        tp, outp = bench(par, derivs, us)
        dl = float(jnp.max(jnp.abs(outs.l - outp.l)))
        print(f"N={N:6d}  serial={ts*1e3:9.2f} ms  parallel={tp*1e3:9.2f} ms"
              f"  speedup={ts/tp:6.2f}x  max|dl|={dl:.2e}", flush=True)

        if args.batch:
            B = args.batch
            db = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), derivs)
            ub = jnp.broadcast_to(us[None], (B,) + us.shape)
            lamb = jnp.broadcast_to(lam[None], (B,))
            vserial = jax.jit(jax.vmap(
                lambda d, u, lm: back_pass(d, u, lm, 1, False, hyper)))
            vpar = jax.jit(jax.vmap(
                lambda d, u, lm: parallel_back_pass(d, u, lm, 1, hyper)))
            tsb, _ = bench(vserial, db, ub, lamb)
            tpb, _ = bench(vpar, db, ub, lamb)
            print(f"         batched B={B}: serial={tsb*1e3:9.2f} ms "
                  f"parallel={tpb*1e3:9.2f} ms  speedup={tsb/tpb:6.2f}x",
                  flush=True)


if __name__ == "__main__":
    main()
