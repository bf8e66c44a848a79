"""Time the fused Pallas backward pass against the reverse-scan version on
the current backend (CarParking shapes: n_x=4, n_u=2, constrained).

Usage: python scripts/profile_backpass.py [B] [N] [K]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


if __name__ == "__main__":
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from jax import lax

    from ddp_generator_tpu.ops.backpass import back_pass
    from ddp_generator_tpu.ops.boxqp import BoxQPHyper
    from ddp_generator_tpu.ops.pallas_backpass import batched_back_pass_pallas

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tests.test_pallas_backpass import _rand_bundle

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    on_tpu = jax.default_backend() == "tpu"
    log(f"backend={jax.default_backend()} B={B} N={N} K={K}")

    rng = np.random.default_rng(0)
    derivs, us = _rand_bundle(rng, B, N, 4, 2, True, True, spd_scale=5.0)
    if on_tpu:
        derivs = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, derivs)
        us = us.astype(jnp.float32)
    lam = jnp.full((B,), 0.1, us.dtype)
    hyper = BoxQPHyper(method="enumerate")

    def loopK(fn):
        def run():
            def body(i, acc):
                out = fn(acc)
                return acc * 0.0 + out * 1e-30 + acc
            return lax.fori_loop(0, K, body, jnp.zeros((B,), us.dtype))
        return jax.jit(run)

    def timeK(name, fn):
        out = fn()
        np.asarray(out)
        times = []
        for _ in range(3):
            t0 = time.time()
            out = fn()
            np.asarray(out)
            times.append(time.time() - t0)
        print(f"{name:24s} {min(times)/K*1e3:9.2f} ms/exec")
        return out

    vscan = jax.vmap(lambda d, u, lm: back_pass(d, u, lm, 1, True, hyper))

    def scan_once(acc):
        bp = vscan(
            derivs._replace(
                step=derivs.step._replace(cu=derivs.step.cu + 1e-30 * acc[:, None, None])
            ), us, lam)
        return bp.g_norm

    def pallas_once(acc):
        bp = batched_back_pass_pallas(
            derivs._replace(
                step=derivs.step._replace(cu=derivs.step.cu + 1e-30 * acc[:, None, None])
            ), us, lam, 1, True, interpret=not on_tpu)
        return bp.g_norm

    skip_scan = os.environ.get("SKIP_SCAN", "0") == "1"
    r2 = jax.jit(lambda: batched_back_pass_pallas(
        derivs, us, lam, 1, True, interpret=not on_tpu))()
    log("pallas compiled and ran")
    if not skip_scan:
        r1 = jax.jit(lambda: vscan(derivs, us, lam))()
        err = float(jnp.max(jnp.abs(r1.l - r2.l)))
        gerr = float(jnp.max(jnp.abs(r1.g_norm - r2.g_norm)))
        fmatch = bool(jnp.all(r1.failed == r2.failed))
        print(f"parity: max|l| diff={err:.3e} max|g| diff={gerr:.3e} failed match={fmatch}")
    timeK("pallas back_pass", loopK(pallas_once))
    if not skip_scan:
        timeK("scan back_pass", loopK(scan_once))
