"""Inspection API tests (MMex-equivalent surface, SURVEY.md component 12)."""

import jax.numpy as jnp
import numpy as np

from ddp_generator_tpu.inspect_api import inspect
from ddp_generator_tpu.models import car_parking


def test_modes_exposed():
    insp = inspect(car_parking.car_parking())
    p = car_parking.default_params()
    x = jnp.asarray([0.3, -0.2, 0.5, 0.1])
    u = jnp.asarray([0.1, -0.4])
    k = 0
    # mode table (iLQG_MMex.tem:81-226)
    assert insp.by_mode(0)(x, u, p, k).shape == (4,)
    assert insp.by_mode(1)(x, u, p, k).shape == ()
    assert insp.by_mode(2)(x, p, k).shape == ()
    assert insp.by_mode(3)(x, p, k).shape == (4,)
    assert insp.by_mode(4)(x, p, k).shape == (4, 4)
    assert insp.by_mode(10)(x, u, p, k).shape == (4, 4)
    assert insp.by_mode(11)(x, u, p, k).shape == (4, 2)
    assert insp.by_mode(12)(x, u, p, k).shape == (4, 4, 4)
    assert insp.by_mode(14)(x, u, p, k).shape == (4, 4, 2)
    assert insp.by_mode(9)(x, u, p, k).shape == (4, 2)


def test_clamp_mode_16():
    insp = inspect(car_parking.car_parking())
    p = car_parking.default_params()
    x = jnp.zeros(4)
    u = jnp.asarray([2.0, -9.0])
    uc = insp.by_mode(16)(x, u, p, 0)
    np.testing.assert_allclose(uc, [0.5, -2.0])


def test_hessian_symmetry():
    insp = inspect(car_parking.car_parking())
    p = car_parking.default_params()
    x = jnp.asarray([0.5, 0.1, -0.3, 0.8])
    u = jnp.asarray([0.2, 0.1])
    Lxx = insp.Lxx(x, u, p, 0)
    np.testing.assert_allclose(Lxx, Lxx.T, atol=1e-12)
    Fxx = insp.Fxx(x, p, 0)
    np.testing.assert_allclose(Fxx, Fxx.T, atol=1e-12)
    # Lxu is the transpose of Lux
    import jax
    Lux = jax.jacfwd(jax.grad(insp.problem.L, argnums=1), argnums=0)(x, u, p, 0)
    np.testing.assert_allclose(insp.Lxu(x, u, p, 0), Lux.T, atol=1e-12)
