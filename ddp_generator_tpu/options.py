"""Solver options.

Same 19 runtime options, names, defaults and range validation as the reference
``standard_parameters`` / ``setOptParam`` (``iLQG.c:57-216``), so a reference
user can carry an options struct over verbatim.  Extra TPU-native knobs
(``full_ddp``, ``dtype``, ``boxqp_max_iter`` ...) map to the reference's
compile-time defines (``FULL_DDP`` at ``iLQG.h:4-6``, boxQP hyper-parameters at
``boxQP.c:52-57``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

# Default 8-point alpha schedule 10^linspace(0,-3,8) (iLQG.c:36).
DEFAULT_ALPHA: Tuple[float, ...] = (
    1.0,
    0.3727594,
    0.1389495,
    0.0517947,
    0.0193070,
    0.0071969,
    0.0026827,
    0.0010000,
)

_INF = float("inf")


class OptionError(ValueError):
    """Bad option value (mirrors the setOptParam error strings, iLQG.c:80-89)."""


@dataclasses.dataclass(frozen=True)
class SolverOptions:
    """Runtime solver options (defaults: ``standard_parameters``, iLQG.c:57-78)."""

    alpha: Tuple[float, ...] = DEFAULT_ALPHA
    tolFun: float = 1e-7
    tolConstraint: float = 1e-7
    tolGrad: float = 1e-5
    max_iter: int = 20
    lambdaInit: float = 1.0
    dlambdaInit: float = 1.0
    lambdaFactor: float = 1.6
    lambdaMax: float = 1e10
    lambdaMin: float = 1e-6
    regType: int = 1
    zMin: float = 0.0
    debug_level: int = 2
    w_pen_init_l: float = 1.0
    w_pen_init_f: float = 1.0
    w_pen_max_l: float = _INF
    w_pen_max_f: float = _INF
    w_pen_fact1: float = 4.0  # 4..10, Bertsekas p. 123 (iLQG.c:76)
    w_pen_fact2: float = 1.0

    # --- TPU-native extensions (reference compile-time knobs) ---
    full_ddp: bool = True  # FULL_DDP (iLQG.h:4-6): 2nd-order dynamics terms
    dtype: str = "float64"  # numeric dtype of the solve
    # boxQP hyper-parameters (boxQP.c:52-57).  The two tolerances default to
    # "auto": the reference values (1e-8) in float64, loosened to what the
    # dtype can resolve in float32 (1e-5 / 1e-6) -- a warm-started QP cannot
    # drive its gradient below ~eps*|g| so the float64 tolerances would trip
    # spurious non-descent failures.  Any explicit float is used verbatim.
    boxqp_max_iter: int = 100
    boxqp_min_grad: "float | str" = "auto"
    boxqp_min_rel_improve: "float | str" = "auto"
    boxqp_step_dec: float = 0.6
    boxqp_min_step: float = 1e-22
    boxqp_armijo: float = 0.1
    # "auto": exact active-set enumeration for n_u <= 3, projected-Newton
    # otherwise; "newton": always the faithful boxQP.c iteration;
    # "enumerate": always enumeration.
    boxqp_method: str = "auto"
    # "serial": reverse-scan Riccati recursion (reference semantics);
    # "parallel": O(log N)-depth associative-scan Riccati (unconstrained
    # problems with full_ddp=False only; see ops/parallel_riccati.py);
    # "pallas": the whole backward pass as one fused TPU kernel for batched
    # solves (n_u <= 3; see ops/pallas_backpass.py) -- falls back to
    # "serial" for unbatched calls;
    # "fused": like "pallas" but ALSO computes the derivative bundle on the
    # fly inside the kernel (nested jvp/linearize along component basis
    # directions), so the bundle never touches HBM (ops/pallas_fused.py;
    # shared params only, batched solves only -- unbatched calls fall back
    # to "serial").  Experimental: measured SLOWER than "pallas" + the
    # separate per-family emission on v5e even after the round-4 time-block
    # fix made S>1 compile (split path emission+kernel = 3.05 ms at batch
    # 2048 vs fused ~8.8 ms; Mosaic's codegen for in-kernel autodiff trails
    # XLA's, BASELINE.md rounds 3-4) -- kept as a documented negative
    # result for problems/hardware where the bundle traffic dominates.
    backpass_method: str = "serial"
    # "serial": vmap-of-scan rollouts (reference semantics, any backend);
    # "pallas": the whole multi-alpha line search as two fused TPU kernels
    # for batched solves (see ops/pallas_rollout.py) -- requires shared
    # (unbatched) params; falls back to "serial" for unbatched calls.
    # Uses slightly different transcendental implementations (asin & co,
    # ops/pallas_math.py), so results may differ from "serial" at the
    # float-roundoff level.
    linesearch_method: str = "serial"
    # Staged pallas line search (linesearch_method="pallas" only): roll ONLY
    # alpha[0] first (the reference's serial search tries alpha=1 first and
    # usually accepts it, line_search.c:33-45); the full 8-alpha sweep +
    # selected rollout run under lax.cond only on iterations where some
    # live lane rejects alpha[0].  Per-lane results are identical either
    # way; this is purely a scheduling optimization.
    linesearch_staged: bool = True
    # Where lambda-escalation retries run (the reference's inner while,
    # iLQG.c:261-284: a failed backward pass escalates lambda and re-runs
    # ONLY the backward pass on the unchanged derivative bundle):
    # "deferred" (default): a failed pass returns to the outer loop and the
    #   retry is the NEXT body call.  The retry re-pays derivative emission
    #   and masked line-search compute, BUT retries of different lanes
    #   overlap in the same call -- measured 40.7% of CarParking bench body
    #   calls are such retries, yet this still wins at production batch:
    #   682 vs 501 solves/s (B=2048, v5e, back-to-back A/B).
    # "inline": a while_loop around only the backward pass inside one
    #   body call.  Loses at large batch because escalation ladders are
    #   DEEP (lambda decays toward lambdaMin on accepts, so a failing lane
    #   climbs many rungs) and the batch-wide loop runs max-over-lanes
    #   rungs at one kernel execution each while every other lane waits.
    #   The right choice for unbatched / small-batch solves, where it is
    #   exactly the reference's control flow.
    # Per-lane (lambda, attempt) sequences and results are identical.
    lam_retry: str = "deferred"
    # Derivative-bundle emitter for the batched pallas path (shared
    # params): "per-family" = one linearize family per derivative object;
    # "shared" = single-primal-trace emission
    # (pallas_fused.step_derivative_components_shared).  Values are
    # bit-identical; this is purely a scheduling choice.  Counterintuitive
    # MEASURED result (v5e, B=2048, N=500): per-family runs at the bundle
    # write-bandwidth floor (0.91 ms) while "shared" -- despite 3x fewer
    # transcendental instructions in the compiled HLO -- is 12x slower
    # (10.8 ms): the vmapped-linearize tower lowers to layouts Mosaic/XLA
    # schedule far worse than the straight-line per-family code, and the
    # emission was never transcendental-bound on TPU in the first place.
    derivs_emitter: str = "per-family"
    # lax.scan unroll factor for the horizon sweeps (rollout + backward
    # pass); >1 trades compile time for less loop overhead on TPU.
    scan_unroll: int = 1
    # MOD_CHOL (reference boxQP.c:69-72, cholesky.c:129-287): experimental
    # Schnabel-Eskow pre-regularization of Quu inside boxQP; off by default
    # exactly like the reference compile flag.
    use_mod_chol: bool = False

    def __post_init__(self):
        a = np.asarray(self.alpha, dtype=np.float64)
        if np.any((a < 0.0) | (a > 1.0)):
            raise OptionError("all alpha must be in the range [1.0..0.0)")
        if np.any(np.diff(a) >= 0.0):
            raise OptionError("all alpha must be monotonically decreasing")
        for nm in (
            "tolFun",
            "tolConstraint",
            "tolGrad",
            "lambdaInit",
            "dlambdaInit",
            "lambdaMax",
            "lambdaMin",
            "w_pen_init_l",
            "w_pen_init_f",
            "w_pen_max_l",
            "w_pen_max_f",
        ):
            if getattr(self, nm) < 0.0:
                raise OptionError(f"{nm}: parameter must be positive")
        if self.tolFun <= 0 or self.tolGrad <= 0 or self.tolConstraint <= 0:
            raise OptionError("parameter must be positive")
        if self.max_iter < 0:
            raise OptionError("max_iter: parameter must be positive")
        for nm in ("lambdaFactor", "w_pen_fact1", "w_pen_fact2"):
            if getattr(self, nm) < 1.0:
                raise OptionError(f"{nm}: parameter must be > 1")
        if not 1 <= self.regType <= 2:
            raise OptionError("regType: parameter must be in range [1..2]")
        if not 0.0 <= self.zMin < 1.0:
            raise OptionError("zMin: parameter must be in range [0..1)")
        if not 0 <= self.debug_level <= 6:
            raise OptionError("debug_level: parameter must be in range [0..6]")
        for nm in ("boxqp_min_grad", "boxqp_min_rel_improve"):
            v = getattr(self, nm)
            if v != "auto" and (not isinstance(v, (int, float)) or v <= 0):
                raise OptionError(f"{nm} must be 'auto' or a positive float")
        if self.boxqp_method not in ("auto", "newton", "enumerate"):
            raise OptionError("boxqp_method must be auto|newton|enumerate")
        if self.backpass_method not in ("serial", "parallel", "pallas",
                                        "fused"):
            raise OptionError(
                "backpass_method must be serial|parallel|pallas|fused"
            )
        if self.linesearch_method not in ("serial", "pallas"):
            raise OptionError("linesearch_method must be serial|pallas")
        if self.lam_retry not in ("inline", "deferred"):
            raise OptionError("lam_retry must be inline|deferred")
        if self.derivs_emitter not in ("shared", "per-family"):
            raise OptionError("derivs_emitter must be shared|per-family")
        # The Pallas kernels' in-kernel boxQP is the exact 3^n active-set
        # enumeration; they never consume the projected-Newton iteration or
        # the Schnabel-Eskow MOD_CHOL preconditioner (boxQP.c:69-72).
        # Without this check identical options silently meant DIFFERENT
        # algorithms at B=1 (XLA fallback honors them) vs B>1 (kernel
        # ignores them) -- fail fast instead (round-4 verdict, weak #4).
        if self.backpass_method in ("pallas", "fused"):
            if self.use_mod_chol:
                raise OptionError(
                    f"use_mod_chol=True is not supported by "
                    f"backpass_method='{self.backpass_method}' (the kernel "
                    f"boxQP enumerates active sets and never factorizes); "
                    f"use backpass_method='serial' for MOD_CHOL"
                )
            if self.boxqp_method == "newton":
                raise OptionError(
                    f"boxqp_method='newton' is not supported by "
                    f"backpass_method='{self.backpass_method}' (the kernel "
                    f"boxQP is the exact enumeration); use 'auto', "
                    f"'enumerate', or backpass_method='serial'"
                )

    @property
    def n_alpha(self) -> int:
        return len(self.alpha)

    def replace(self, **kw) -> "SolverOptions":
        return dataclasses.replace(self, **kw)


def options_from_dict(d: dict) -> SolverOptions:
    """Build options from a name->value mapping (the MEX ``Op`` struct path,
    ``iLQG_mex.c:60-67``).  Unknown names raise, as ``setOptParam`` does
    (``iLQG.c:211-212``)."""
    valid = {f.name for f in dataclasses.fields(SolverOptions)}
    kw = {}
    for name, value in d.items():
        if name not in valid:
            raise OptionError(f"{name}: no such parameter")
        if name == "alpha":
            value = tuple(float(v) for v in np.atleast_1d(value))
        elif name in ("max_iter", "regType", "debug_level", "boxqp_max_iter"):
            value = int(value)
        elif name in ("full_ddp", "linesearch_staged"):
            value = bool(value)
        elif name in ("dtype", "lam_retry", "derivs_emitter", "boxqp_method",
                      "backpass_method", "linesearch_method"):
            value = str(value)
        elif name in ("boxqp_min_grad", "boxqp_min_rel_improve"):
            value = value if value == "auto" else float(value)
        else:
            value = float(value)
        kw[name] = value
    return SolverOptions(**kw)
