"""Plot Brachistochrone solutions against the analytic cycloid
(counterpart of the ``testBrachi.m`` / ``testBrachi_hli.m`` overlays,
``testBrachi.m:29-35``).

Solves at several discretizations, overlays the cycloid ground truth, and
optionally the moving-floor (hli) variant.

Usage: python scripts/plot_brachi.py [out.png]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "brachistochrone.png"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import ddp_generator_tpu as ddp
    from ddp_generator_tpu.models import brachistochrone

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 5))

    # analytic cycloid, a=2: x = a(phi - sin phi), y = a(cos phi - 1)
    phis = np.linspace(0.0, np.pi, 1000)
    ax1.plot(2 * (phis - np.sin(phis)), 2 * (np.cos(phis) - 1.0),
             "k--", lw=2, label="cycloid (analytic)")

    prob = brachistochrone.brachistochrone()
    opts = ddp.SolverOptions(max_iter=60, w_pen_init_f=40.0,
                             w_pen_fact2=2.0, full_ddp=False)
    for n in (2, 3, 5, 500):  # testBrachi.m:18
        p, x0, u0 = brachistochrone.default_setup(n)
        sol = ddp.solve(prob, x0, u0, p, opts)
        xg = np.linspace(0, 2 * np.pi, n + 1)
        ax1.plot(xg, np.asarray(sol.xs[:, 0]), marker="o" if n <= 5 else None,
                 ms=3, label=f"n={n} (cost {float(sol.cost):.4f})")
    ax1.grid(True); ax1.legend(); ax1.set_title("Brachistochrone vs cycloid")
    ax1.set_xlabel("x"); ax1.set_ylabel("y")

    # moving-floor variant (testBrachi_hli.m)
    n = 100
    prob_h = brachistochrone.brachistochrone_hli()
    p, x0, u0 = brachistochrone.default_setup_hli(n)
    opts_h = ddp.SolverOptions(max_iter=40, w_pen_init_l=40.0,
                               w_pen_init_f=1e-5, w_pen_max_f=1.0,
                               full_ddp=False)
    sol = ddp.solve(prob_h, x0, u0, p, opts_h)
    xg = np.linspace(0, 2 * np.pi, n + 1)
    ax2.plot(2 * (phis - np.sin(phis)), 2 * (np.cos(phis) - 1.0), "k--",
             lw=1, label="cycloid (unconstrained)")
    ax2.plot(xg, np.asarray(p["ymin"]), "r-", lw=1, label="floor ymin[k]")
    ax2.plot(xg, np.asarray(sol.xs[:, 0]), "b-", label="constrained optimum")
    ax2.grid(True); ax2.legend()
    ax2.set_title("hli: time-varying floor ([k]-indexed params)")
    ax2.set_xlabel("x")

    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
