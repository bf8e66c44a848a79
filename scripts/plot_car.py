"""Plot a CarParking solution (counterpart of ``plotOptCar.m``).

Solves the ``testCar.m`` workload and renders the same panels as the
reference plot script (trajectory in the plane, steering angle,
acceleration, orientation, speed) to a PNG.

Usage: python scripts/plot_car.py [T] [max_iter] [out.png]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    max_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    out = sys.argv[3] if len(sys.argv) > 3 else "car_parking.png"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import ddp_generator_tpu as ddp
    from ddp_generator_tpu.models import car_parking

    problem = car_parking.car_parking()
    p, x0, u0 = car_parking.default_setup(T=T, seed=0)
    sol = ddp.solve(problem, x0, u0, p,
                    ddp.SolverOptions(max_iter=max_iter))
    xs = np.asarray(sol.xs)
    us = np.asarray(sol.us)
    t = np.arange(T + 1) * float(p["h"])

    fig = plt.figure(figsize=(11, 7))
    ax = fig.add_subplot(1, 2, 2)
    ax.plot(xs[:, 0], xs[:, 1])
    ax.plot([xs[0, 0]], [xs[0, 1]], "go", label="start")
    ax.plot([0], [0], "rx", label="target")
    ax.grid(True); ax.set_title("x y"); ax.legend(); ax.axis("equal")

    panels = [
        ("steering angle", us[:, 0], t[:-1], [p["limW"][0], p["limW"][1]]),
        ("acceleration", us[:, 1], t[:-1], [p["limA"][0], p["limA"][1]]),
        ("car orientation [deg]", xs[:, 2] / np.pi * 180.0, t, None),
        ("car speed", xs[:, 3], t, None),
    ]
    for i, (title, y, tt, lims) in enumerate(panels):
        ax = fig.add_subplot(4, 2, 2 * i + 1)
        ax.plot(tt, y)
        if lims is not None:
            for lv in lims:
                ax.axhline(float(lv), color="r", ls="--", lw=0.7)
        ax.grid(True); ax.set_title(title)

    fig.suptitle(
        f"CarParking T={T}: success={bool(sol.success)} "
        f"cost={float(sol.cost):.6f} iters={int(sol.iterations)}"
    )
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
