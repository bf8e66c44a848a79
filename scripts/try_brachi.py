import os, sys, time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import ddp_generator_tpu as ddp
from ddp_generator_tpu.models import brachistochrone

n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
prob = brachistochrone.brachistochrone()
p, x0, u0 = brachistochrone.default_setup(n)
opts = ddp.SolverOptions(
    max_iter=50, w_pen_init_f=40.0, w_pen_fact2=2.0, full_ddp=False,
)
t0 = time.time()
sol = ddp.solve(prob, x0, u0, p, opts)
sol.cost.block_until_ready()
t1 = time.time()
print(f"compile+run: {t1-t0:.1f}s")
t0 = time.time()
sol = ddp.solve(prob, x0, u0, p, opts)
sol.cost.block_until_ready()
print(f"run: {time.time()-t0:.3f}s")
print("success:", sol.success, "status:", sol.status, "iters:", sol.iterations)
print("cost:", sol.cost, "g_norm:", sol.g_norm, "lam:", sol.lam)
print("y_final:", sol.xs[-1], "(target -4)")
ys = np.asarray(sol.xs[:, 0])
xgrid = np.linspace(0, 2 * np.pi, n + 1)
# analytic cycloid: x = a(phi - sin phi), y = a(cos phi - 1), a=2
from scipy.optimize import brentq  # noqa

a = 2.0
def y_true(xv):
    # invert x = a(phi - sin phi)
    from scipy.optimize import brentq
    phi = brentq(lambda ph: a * (ph - np.sin(ph)) - xv, 0, np.pi + 1e-9)
    return a * (np.cos(phi) - 1.0)

idx = [n // 4, n // 2, 3 * n // 4, n]
errs = [abs(ys[i] - y_true(xgrid[i])) for i in idx]
print("cycloid errors at quarter points:", errs)
