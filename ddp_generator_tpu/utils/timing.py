"""Timing / profiling utilities.

The reference's only instrumentation is a ``clock()`` around the whole solve
("Time for iLQG", ``iLQG_mex.c:123-126``).  TPU-native equivalents:

* :class:`Timer` -- wall-clock with a *forced device sync through a host
  transfer*: on relay-attached TPU backends ``block_until_ready`` can return
  before execution finishes, so timing must pull at least one element.
* :func:`trace` -- context manager around ``jax.profiler`` for XLA-level
  traces (view in TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import jax
import numpy as np


def device_sync(tree: Any) -> None:
    """Force execution + completion of every array in the pytree.

    Pulls one element of each leaf to the host (see module docstring for why
    ``block_until_ready`` is not enough on some backends).
    """
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            np.asarray(jax.device_get(leaf.flatten()[:1] if leaf.ndim else leaf))


class Timer:
    """``with Timer("solve") as t: ... ; t.seconds``"""

    def __init__(self, name: str = "", sync: Any = None):
        self.name = name
        self._sync = sync
        self.seconds = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync is not None:
            device_sync(self._sync)
        self.seconds = time.perf_counter() - self._t0
        return False


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ddp_trace"):
    """Capture an XLA profiler trace around a block (jax.profiler)."""
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield log_dir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def bench_fn(fn, *args, repeats: int = 3, sync_out: bool = True):
    """min-of-N wall time of a jitted callable, transfer-synced."""
    out = fn(*args)
    device_sync(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        if sync_out:
            device_sync(out)
        times.append(time.perf_counter() - t0)
    return min(times), out
