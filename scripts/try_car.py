import os, sys, time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import ddp_generator_tpu as ddp
from ddp_generator_tpu.models import car_parking

T = int(sys.argv[1]) if len(sys.argv) > 1 else 500
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
prob = car_parking.car_parking()
p, x0, u0 = car_parking.default_setup(T, seed=0)
opts = ddp.SolverOptions(max_iter=iters)
t0 = time.time()
sol = ddp.solve(prob, x0, u0, p, opts)
sol.cost.block_until_ready()
print(f"compile+run: {time.time()-t0:.1f}s")
t0 = time.time()
sol = ddp.solve(prob, x0, u0, p, opts)
sol.cost.block_until_ready()
dt = time.time() - t0
print(f"run: {dt:.3f}s  ({dt/max(int(sol.iterations),1)*1e3:.2f} ms/iter)")
print("success:", sol.success, "status:", sol.status, "iters:", sol.iterations)
print("cost:", sol.cost, "g_norm:", sol.g_norm, "lam:", sol.lam)
print("final state:", sol.xs[-1], "(target ~0)")
print("u in bounds:", float(np.max(np.abs(sol.us[:, 0]))), "<=0.5;",
      float(np.max(np.abs(sol.us[:, 1]))), "<=2.0")
