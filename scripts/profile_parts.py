"""Microbenchmark the solver's per-iteration parts on the current backend.

Each part runs K times inside ONE jitted lax.fori_loop (with a data
dependence so nothing is DCE'd), so per-dispatch overhead of relayed TPU
backends doesn't pollute the numbers.  Reports ms per single execution.
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

    import ddp_generator_tpu as ddp
    from ddp_generator_tpu.models import car_parking
    from ddp_generator_tpu import solver as slv
    from ddp_generator_tpu.derivs import calc_derivs
    from ddp_generator_tpu.ops.backpass import back_pass
    from ddp_generator_tpu.ops.linesearch import line_search
    from ddp_generator_tpu.ops.forward import forward_pass, cost_only

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    # Optional on-device profiler capture: PROFILE_TRACE_DIR=/tmp/xprof
    # wraps every timed section in a jax.profiler trace (viewable with
    # xprof/tensorboard) -- the deep-dive layer under these wall numbers.
    trace_dir = os.environ.get("PROFILE_TRACE_DIR")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        import atexit

        atexit.register(jax.profiler.stop_trace)
    T = 500
    dtype = "float32" if jax.default_backend() == "tpu" else "float64"
    log(f"backend={jax.default_backend()} B={B} K={K} dtype={dtype}")

    problem = car_parking.car_parking()
    on_tpu = jax.default_backend() == "tpu"
    bp_method = "pallas" if on_tpu else "serial"
    ls_method = "pallas" if on_tpu else "serial"
    o = ddp.SolverOptions(max_iter=200, dtype=dtype, tolFun=1e-5,
                          backpass_method=bp_method,
                          linesearch_method=ls_method)
    hyper = slv._boxqp_hyper(o)

    p, x0, _ = car_parking.default_setup(T=T, seed=0)
    rng = np.random.default_rng(0)
    np_dtype = np.dtype(dtype)
    x0s = np.tile(np.asarray(x0, np_dtype), (B, 1))
    u0s = (0.1 * rng.standard_normal((B, T, 2))).astype(np_dtype)
    p = {k: jnp.asarray(np.asarray(v, np_dtype)) for k, v in p.items()}

    init_fn, body_fn, _fin = slv._make_parts(problem, o)
    init = jax.jit(jax.vmap(init_fn, in_axes=(0, 0, None)))
    carry = init(x0s, u0s, p)
    np.asarray(carry.cost)

    mult = carry.mult
    wl, wf = carry.w_pen_l, carry.w_pen_f
    lam = carry.lam

    # acc0 enters as a jit ARGUMENT (not a closed-over constant): with a
    # constant seed XLA can unroll small-K fori_loops and constant-fold the
    # entire computation at compile time (observed: "0.06 ms" calc_derivs).
    _acc0 = jnp.asarray(
        1e-30 * np.random.default_rng(123).standard_normal(B), jnp.dtype(dtype)
    )

    def loopK(step):
        """step: (i, acc_scalar(B,)) -> acc_scalar(B,); run K times."""
        def fn(acc0):
            def body(i, acc):
                return step(i, acc)
            return lax.fori_loop(0, K, body, acc0)
        jfn = jax.jit(fn)
        return lambda: jfn(_acc0)

    def timeK(name, fn):
        if only is not None and not any(s in name for s in only):
            return
        out = fn()
        np.asarray(out)
        times = []
        for _ in range(3):
            t0 = time.time()
            out = fn()
            np.asarray(out)
            times.append(time.time() - t0)
        print(f"{name:30s} {min(times)/K*1e3:9.2f} ms/exec   (total {min(times):.2f}s)")

    # ---- full body iteration ----
    vbody = jax.vmap(body_fn, in_axes=(0, None))

    # The body must see a DIFFERENT carry each loop iteration -- perturbing
    # only `cost` leaves xs/us/mult loop-invariant and XLA hoists the whole
    # derivs+backpass out of the timing loop (measured "3.8 ms" vs the real
    # ~12 ms).  Feed the body's output back as the next carry: K genuine
    # iterations of an evolving solve (the realistic mix of accept/reject).
    def body_chain(c0):
        def body(i, c):
            return vbody(c, p)
        return lax.fori_loop(0, K, body, c0).cost
    jbody = jax.jit(body_chain)
    timeK("full body (1 outer iter)", lambda: jbody(carry))

    # ---- calc_derivs ----
    vderivs = jax.vmap(
        lambda xs, us, m, wl_, wf_: calc_derivs(
            problem, xs, us, p, m.mu_le, m.mu_li, m.mu_fe,
            m.mu_fi, wl_, wf_, o.full_ddp))

    def step_derivs(i, acc):
        d = vderivs(carry.xs + 1e-30 * acc[:, None, None], carry.us, mult, wl, wf)
        return acc + d.final.cx[:, 0] * 1e-30
    timeK("calc_derivs", loopK(step_derivs))

    d0 = jax.jit(vderivs)(carry.xs, carry.us, mult, wl, wf)

    # ---- back_pass (serial scan; skippable -- its vmapped HLO can exceed
    # remote-compile payload limits at large B) ----
    vbp = jax.vmap(lambda d, us, lm: back_pass(d, us, lm, o.regType,
                                               o.full_ddp, hyper))

    def step_bp(i, acc):
        bp = vbp(d0, carry.us + 1e-30 * acc[:, None, None], lam)
        return acc + bp.g_norm * 1e-30
    timeK("back_pass", loopK(step_bp))

    # ---- back_pass (pallas fused kernel, batch-major adapter) ----
    from ddp_generator_tpu.ops.pallas_backpass import batched_back_pass_pallas
    interp = jax.default_backend() != "tpu"
    pbp = lambda d, us, lm: batched_back_pass_pallas(
        d, us, lm, o.regType, o.full_ddp, interpret=interp)

    def step_pbp(i, acc):
        bp = pbp(d0, carry.us + 1e-30 * acc[:, None, None], lam)
        return acc + bp.g_norm * 1e-30
    # NB: at B=2048 the K-looped adapter HLO exceeds the relay's
    # remote-compile payload limit (HTTP 413); filter it out there.
    timeK("back_pass_pallas (adapter)", loopK(step_pbp))

    # ---- production path: packed CM derivs emission ----
    from ddp_generator_tpu.ops.cm_derivs import (
        batched_calc_derivs_cm, cm_derivs_back_pass,
    )
    lam_b = jnp.broadcast_to(lam, (B,))
    wl_v = jnp.broadcast_to(wl, (B,))
    wf_v = jnp.broadcast_to(wf, (B,))

    # bp0 (line-search inputs) via the production path, not the adapter.
    bp0, _dok0 = jax.jit(
        lambda xs, us, lm: cm_derivs_back_pass(
            problem, xs, us, mult.mu_le, mult.mu_li, mult.mu_fe,
            mult.mu_fi, wl_v, wf_v, lm, p, o.regType, o.full_ddp,
            interpret=interp)
    )(carry.xs, carry.us, lam_b)

    def step_cmd(i, acc):
        sd, fcx, fcxx, ok = batched_calc_derivs_cm(
            problem, carry.xs + 1e-30 * acc[:, None, None], carry.us, p,
            mult.mu_le, mult.mu_li, mult.mu_fe, mult.mu_fi,
            wl_v, wf_v, o.full_ddp)
        # Consume EVERY bundle array: reading only fcx lets XLA dead-code
        # the whole emission (measured "0.12 ms" for a 0.65 GB write).  The
        # checksum costs one extra read of the bundle (~bw floor) on top.
        tot = fcx[0] + jnp.sum(fcxx, axis=0)
        for a in sd.values():
            tot = tot + jnp.sum(a.reshape(-1, a.shape[-1]), axis=0)
        return acc + tot * 1e-30
    timeK("calc_derivs_cm+checksum", loopK(step_cmd))

    # ---- fused kernel: derivs computed in-VMEM, zero bundle HBM traffic --
    from ddp_generator_tpu.ops.pallas_fused import fused_derivs_back_pass

    def step_fused(i, acc):
        bp, ok = fused_derivs_back_pass(
            problem, carry.xs + 1e-30 * acc[:, None, None], carry.us,
            mult.mu_le, mult.mu_li, mult.mu_fe, mult.mu_fi,
            wl_v, wf_v, lam_b, p, o.regType, o.full_ddp, interpret=interp)
        return acc + bp.g_norm * 1e-30
    timeK("fused derivs+backpass kernel", loopK(step_fused))

    # ---- production path: derivs + pallas backpass combined ----
    def step_cmbp(i, acc):
        bp, ok = cm_derivs_back_pass(
            problem, carry.xs + 1e-30 * acc[:, None, None], carry.us,
            mult.mu_le, mult.mu_li, mult.mu_fe, mult.mu_fi,
            wl_v, wf_v, lam_b, p, o.regType, o.full_ddp, interpret=interp)
        return acc + bp.g_norm * 1e-30
    timeK("derivs+backpass_cm (prod)", loopK(step_cmbp))

    # ---- pallas backpass kernel ONLY (pre-packed CM inputs) ----
    from ddp_generator_tpu.derivs import StepDerivs
    from ddp_generator_tpu.ops.pallas_backpass import pallas_back_pass_cm
    sd0, fcx0, fcxx0, _ok0 = jax.jit(
        lambda xs: batched_calc_derivs_cm(
            problem, xs, carry.us, p, mult.mu_le, mult.mu_li,
            mult.mu_fe, mult.mu_fi, wl_v, wf_v, o.full_ddp)
    )(carry.xs)
    us_cm0 = jnp.transpose(carry.us, (2, 1, 0))  # (n_u, N, B)

    # sd0 must enter as jit ARGUMENTS: closed-over device arrays are baked
    # into the HLO as literals and the remote-compile payload blows the
    # relay's request-size limit (HTTP 413) at B=2048.
    def kern_chain(acc0, sd, fcx, fcxx, us_cm):
        def body(i, acc):
            l_cm, L_cm, dV, g, failed = pallas_back_pass_cm(
                StepDerivs(**{k: (v + 1e-30 * acc[None, None, :]
                                  if k == 'cx' else v)
                              for k, v in sd.items()}),
                fcx, fcxx, us_cm, lam_b[None, :], problem.n_x,
                reg_type=o.regType, full_ddp=o.full_ddp, interpret=interp)
            return acc + g[0] * 1e-30
        return lax.fori_loop(0, K, body, acc0)
    jkern = jax.jit(kern_chain)
    timeK("backpass kernel only (CM in)",
          lambda: jkern(_acc0, dict(sd0), fcx0, fcxx0, us_cm0))

    # ---- line_search ----
    alphas = jnp.asarray(o.alpha, jnp.dtype(dtype))
    vls = jax.vmap(
        lambda x0_, xs, us, l, L, dV, cost, m, wl_, wf_:
        line_search(problem, alphas, x0_, xs, us, l, L, dV, cost, o.zMin, p,
                    m.mu_le, m.mu_li, m.mu_fe, m.mu_fi, wl_, wf_))

    def step_ls(i, acc):
        ls = vls(carry.xs[:, 0], carry.xs, carry.us + 1e-30 * acc[:, None, None],
                 bp0.l, bp0.L, bp0.dV, carry.cost, mult, wl, wf)
        return acc + ls.new_cost * 1e-30
    timeK("line_search (8 alphas)", loopK(step_ls))

    # ---- pallas line_search ----
    from ddp_generator_tpu.ops.pallas_rollout import (
        pallas_line_search, pallas_line_search_staged,
    )
    alpha_tuple = tuple(float(a) for a in o.alpha)
    wl_b = jnp.broadcast_to(wl, (B,))
    wf_b = jnp.broadcast_to(wf, (B,))

    def step_pls(i, acc):
        ls = pallas_line_search(
            problem, alpha_tuple, carry.xs[:, 0], carry.xs,
            carry.us + 1e-30 * acc[:, None, None], bp0.l, bp0.L, bp0.dV,
            carry.cost, o.zMin, p, mult.mu_le, mult.mu_li, mult.mu_fe,
            mult.mu_fi, wl_b, wf_b, interpret=interp)
        return acc + ls.new_cost * 1e-30
    timeK("line_search_pallas", loopK(step_pls))

    # ---- staged pallas line_search ----
    # dead-skip: alive=False everywhere now short-circuits BOTH stages
    # (round-5 all-retry gating) -- measures the skip overhead (~0).
    # stage1: the quick path's kernel cost measured directly (single-alpha
    # rollout with trajectory + cost through _LSCtx.call).
    # full: alive=True and the init-rollout inputs reject alpha[0], so this
    # costs stage1 + sweep + selected.
    no_live = jnp.zeros((B,), bool)
    all_live = jnp.ones((B,), bool)

    def step_sls(alive):
        def fn(i, acc):
            ls = pallas_line_search_staged(
                problem, alpha_tuple, carry.xs[:, 0], carry.xs,
                carry.us + 1e-30 * acc[:, None, None], bp0.l, bp0.L,
                bp0.dV, carry.cost, o.zMin, p, mult.mu_le, mult.mu_li,
                mult.mu_fe, mult.mu_fi, wl_b, wf_b, alive=alive,
                interpret=interp)
            return acc + ls.new_cost * 1e-30
        return fn
    timeK("line_search_staged dead-skip", loopK(step_sls(no_live)))

    from ddp_generator_tpu.ops.pallas_rollout import _LSCtx

    def step_stage1(i, acc):
        ctx = _LSCtx(problem, carry.xs[:, 0], carry.xs,
                     carry.us + 1e-30 * acc[:, None, None], bp0.l, bp0.L,
                     bp0.dV, carry.cost, mult.mu_le, mult.mu_li,
                     mult.mu_fe, mult.mu_fi, wl_b, wf_b)
        a0v = jnp.full((1, ctx.Bp), float(alpha_tuple[0]), ctx.dtype)
        xs0, xf0, us0, cost0, ok0 = ctx.call(
            problem, alpha_tuple, p, a0v, multi=False, interpret=interp,
            want_cost=True)
        return acc + cost0[0][:B] * 1e-30
    timeK("line_search_staged stage1 (quick)", loopK(step_stage1))
    timeK("line_search_staged full", loopK(step_sls(all_live)))

    # ---- forward_pass (1 alpha) ----
    vfp = jax.vmap(
        lambda x0_, xs, us, l, L, m, wl_, wf_:
        forward_pass(problem, x0_, xs, us, l, L,
                     jnp.asarray(1.0, jnp.dtype(dtype)), p,
                     m.mu_le, m.mu_li, m.mu_fe, m.mu_fi, wl_, wf_))

    def step_fp(i, acc):
        r = vfp(carry.xs[:, 0], carry.xs, carry.us + 1e-30 * acc[:, None, None],
                bp0.l, bp0.L, mult, wl, wf)
        return acc + r.cost * 1e-30
    timeK("forward_pass (1 alpha)", loopK(step_fp))

    # ---- cost_only ----
    vco = jax.vmap(
        lambda xs, us, m, wl_, wf_: cost_only(problem, xs, us, p, m.mu_le,
                                 m.mu_li, m.mu_fe, m.mu_fi, wl_, wf_))

    def step_co(i, acc):
        c = vco(carry.xs + 1e-30 * acc[:, None, None], carry.us, mult, wl, wf)
        return acc + c * 1e-30
    timeK("cost_only", loopK(step_co))
