"""Native checkpoint/restore engine tests (C++ libddp_io + ctypes)."""

import os

import numpy as np
import pytest

from ddp_generator_tpu.native import (
    AsyncCheckpointWriter,
    build,
    load_arrays,
    load_pytree,
    native_available,
    save_arrays,
    save_pytree,
)


@pytest.fixture(scope="module", autouse=True)
def built():
    build()
    assert native_available()


def test_roundtrip_arrays(tmp_path):
    arrays = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b/c": np.random.default_rng(0).standard_normal((2, 3, 5)),
        "flags": np.array([True, False, True]),
        "idx": np.arange(7, dtype=np.int32),
        "scalar": np.float64(3.5).reshape(()),
    }
    p = str(tmp_path / "ck.ddpt")
    save_arrays(p, arrays)
    out = load_arrays(p)
    assert set(out) == set(arrays)
    for k in arrays:
        np.testing.assert_array_equal(out[k], np.asarray(arrays[k]))
        assert out[k].dtype == np.asarray(arrays[k]).dtype


def test_corruption_detected(tmp_path):
    p = str(tmp_path / "ck.ddpt")
    save_arrays(p, {"x": np.ones(100, np.float64)})
    raw = bytearray(open(p, "rb").read())
    raw[200] ^= 0xFF  # flip a payload byte
    open(p, "wb").write(bytes(raw))
    with pytest.raises(IOError, match="CRC|truncated|ddpio"):
        load_arrays(p)


def test_async_writer(tmp_path):
    w = AsyncCheckpointWriter(max_queue=8)
    paths = []
    for i in range(5):
        p = str(tmp_path / f"ck{i}.ddpt")
        assert w.submit(p, {"step": np.full((64, 64), i, np.float32)})
        paths.append(p)
    w.drain()
    assert w.completed == 5
    assert w.failed == 0
    for i, p in enumerate(paths):
        out = load_arrays(p)
        assert out["step"][0, 0] == i
    w.close()


def test_pytree_roundtrip(tmp_path):
    import jax.numpy as jnp

    tree = {
        "xs": jnp.ones((4, 3)),
        "nested": {"mu": jnp.zeros((2,)), "it": jnp.asarray(7, jnp.int32)},
    }
    p = str(tmp_path / "tree.ddpt")
    save_pytree(p, tree)
    like = {
        "xs": jnp.zeros((4, 3)),
        "nested": {"mu": jnp.ones((2,)), "it": jnp.asarray(0, jnp.int32)},
    }
    out = load_pytree(p, like)
    np.testing.assert_array_equal(out["xs"], np.ones((4, 3)))
    # 0-d scalars must roundtrip as 0-d (np.ascontiguousarray used to
    # promote them to shape (1,), which also made int() a DeprecationWarning)
    assert np.shape(out["nested"]["it"]) == ()
    assert int(out["nested"]["it"]) == 7


def test_solver_carry_checkpoint_resume(tmp_path):
    """Snapshot a running stepwise solve mid-way and resume it elsewhere."""
    import jax

    jax.config.update("jax_enable_x64", True)
    import ddp_generator_tpu as ddp
    from ddp_generator_tpu.models import car_parking

    prob = car_parking.car_parking()
    p, x0, _ = car_parking.default_setup(T=60)
    rng = np.random.default_rng(0)
    B = 2
    x0s = np.tile(np.asarray(x0), (B, 1))
    u0s = 0.1 * rng.standard_normal((B, 60, 2))
    opts = ddp.SolverOptions(max_iter=30)
    s = ddp.StepwiseSolver(prob, opts, chunk=5, donate=False)

    carry = s._init(x0s, u0s, p)
    carry, _ = s._chunk(carry, p)  # 5 iterations
    ckpt = str(tmp_path / "carry.ddpt")
    save_pytree(ckpt, carry)

    # resume: restore into a fresh carry structure and continue
    carry2 = load_pytree(ckpt, carry)
    while int(s._active(carry2)) > 0:
        carry2, _ = s._chunk(carry2, p)
    sol_resumed = s._finalize(carry2)

    # uninterrupted run for comparison
    sol_direct = s(x0s, u0s, p)
    np.testing.assert_allclose(sol_resumed.cost, sol_direct.cost, rtol=0)
    np.testing.assert_array_equal(sol_resumed.iterations, sol_direct.iterations)
