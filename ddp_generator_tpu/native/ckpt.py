"""Checkpoint/restore: Python bindings for the native tensor-archive engine.

Pytree checkpointing for solver state (e.g. the stepwise solver's carry):
flatten to named arrays, write through ``libddp_io.so`` (async-capable),
restore by unflattening.  Falls back to ``numpy.savez`` when the native
library cannot be built.

The reference has no checkpoint subsystem at all (SURVEY.md section 5).
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Any, Dict, Optional

import numpy as np

from .build import build

_MAX_DIMS = 8

# dtype codes in the archive (stable across platforms)
_DTYPE_CODES = {
    np.dtype("float32"): 1,
    np.dtype("float64"): 2,
    np.dtype("int32"): 3,
    np.dtype("int64"): 4,
    np.dtype("bool"): 5,
    np.dtype("uint8"): 6,
    np.dtype("int8"): 7,
    np.dtype("uint32"): 8,
    np.dtype("float16"): 9,
}
_CODE_DTYPES = {v: k for k, v in _DTYPE_CODES.items()}

_lib = None
_lib_lock = threading.Lock()


def _load_lib():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        path = build()
        lib = ctypes.CDLL(path)
        lib.ddpio_write.restype = ctypes.c_int
        lib.ddpio_open.restype = ctypes.c_void_p
        lib.ddpio_open.argtypes = [ctypes.c_char_p]
        lib.ddpio_count.restype = ctypes.c_int32
        lib.ddpio_count.argtypes = [ctypes.c_void_p]
        lib.ddpio_error.restype = ctypes.c_char_p
        lib.ddpio_error.argtypes = [ctypes.c_void_p]
        lib.ddpio_last_error.restype = ctypes.c_char_p
        lib.ddpio_name.restype = ctypes.c_char_p
        lib.ddpio_name.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.ddpio_dtype.restype = ctypes.c_int32
        lib.ddpio_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.ddpio_ndim.restype = ctypes.c_int32
        lib.ddpio_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.ddpio_dims.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_int64)
        ]
        lib.ddpio_nbytes.restype = ctypes.c_int64
        lib.ddpio_nbytes.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.ddpio_read.restype = ctypes.c_int
        lib.ddpio_read.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64
        ]
        lib.ddpio_close.argtypes = [ctypes.c_void_p]
        lib.ddpio_writer_create.restype = ctypes.c_void_p
        lib.ddpio_writer_create.argtypes = [ctypes.c_int32]
        lib.ddpio_writer_submit.restype = ctypes.c_int
        lib.ddpio_writer_drain.argtypes = [ctypes.c_void_p]
        lib.ddpio_writer_completed.restype = ctypes.c_int64
        lib.ddpio_writer_completed.argtypes = [ctypes.c_void_p]
        lib.ddpio_writer_failed.restype = ctypes.c_int64
        lib.ddpio_writer_failed.argtypes = [ctypes.c_void_p]
        lib.ddpio_writer_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    try:
        _load_lib()
        return True
    except Exception:
        return False


def _pack_args(arrays: Dict[str, np.ndarray]):
    n = len(arrays)
    # NB: np.ascontiguousarray would silently promote 0-d scalars to (1,),
    # breaking shape roundtrip; np.asarray(..., order="C") preserves ndim=0.
    items = [(k, np.asarray(v, order="C")) for k, v in arrays.items()]
    names = (ctypes.c_char_p * n)(*[k.encode() for k, _ in items])
    dtypes = (ctypes.c_int32 * n)(
        *[_DTYPE_CODES[a.dtype] for _, a in items]
    )
    ndims = (ctypes.c_int32 * n)(*[a.ndim for _, a in items])
    dims = (ctypes.c_int64 * (n * _MAX_DIMS))()
    for i, (_, a) in enumerate(items):
        for j, d in enumerate(a.shape):
            dims[i * _MAX_DIMS + j] = d
    datas = (ctypes.c_void_p * n)(
        *[a.ctypes.data_as(ctypes.c_void_p).value for _, a in items]
    )
    nbytes = (ctypes.c_int64 * n)(*[a.nbytes for _, a in items])
    return items, names, dtypes, ndims, dims, datas, nbytes


def save_arrays(path: str, arrays: Dict[str, np.ndarray]) -> None:
    """Synchronous archive write (native; numpy fallback)."""
    for k, v in arrays.items():
        if np.dtype(v.dtype) not in _DTYPE_CODES:
            raise ValueError(f"unsupported dtype {v.dtype} for '{k}'")
    try:
        lib = _load_lib()
    except Exception:
        np.savez(path, **arrays)
        return
    items, names, dtypes, ndims, dims, datas, nbytes = _pack_args(arrays)
    rc = lib.ddpio_write(
        path.encode(), len(items), names, dtypes, ndims, dims, datas, nbytes
    )
    if rc != 0:
        raise IOError(
            f"ddpio_write failed: {lib.ddpio_last_error().decode()}"
        )


def load_arrays(path: str) -> Dict[str, np.ndarray]:
    try:
        lib = _load_lib()
    except Exception:
        with np.load(path if os.path.exists(path) else path + ".npz") as z:
            return {k: z[k] for k in z.files}
    h = lib.ddpio_open(path.encode())
    try:
        count = lib.ddpio_count(h)
        if count < 0:
            raise IOError(f"ddpio_open: {lib.ddpio_error(h).decode()}")
        out = {}
        for i in range(count):
            name = lib.ddpio_name(h, i).decode()
            dtype = _CODE_DTYPES[lib.ddpio_dtype(h, i)]
            ndim = lib.ddpio_ndim(h, i)
            dims = (ctypes.c_int64 * _MAX_DIMS)()
            lib.ddpio_dims(h, i, dims)
            shape = tuple(dims[j] for j in range(ndim))
            a = np.empty(shape, dtype)
            rc = lib.ddpio_read(
                h, i, a.ctypes.data_as(ctypes.c_void_p), a.nbytes
            )
            if rc != 0:
                raise IOError(f"ddpio_read size mismatch for '{name}'")
            out[name] = a
        return out
    finally:
        lib.ddpio_close(h)


class AsyncCheckpointWriter:
    """Background-thread checkpoint writer (native writer thread).

    ``submit`` copies the arrays into the native job queue and returns
    immediately; ``drain`` blocks until all queued writes hit disk.
    """

    def __init__(self, max_queue: int = 4):
        self._lib = _load_lib()
        self._h = self._lib.ddpio_writer_create(max_queue)

    def submit(self, path: str, arrays: Dict[str, np.ndarray]) -> bool:
        items, names, dtypes, ndims, dims, datas, nbytes = _pack_args(arrays)
        rc = self._lib.ddpio_writer_submit(
            ctypes.c_void_p(self._h), path.encode(), len(items), names,
            dtypes, ndims, dims, datas, nbytes,
        )
        return rc == 0

    def drain(self) -> None:
        self._lib.ddpio_writer_drain(ctypes.c_void_p(self._h))

    @property
    def completed(self) -> int:
        return self._lib.ddpio_writer_completed(ctypes.c_void_p(self._h))

    @property
    def failed(self) -> int:
        return self._lib.ddpio_writer_failed(ctypes.c_void_p(self._h))

    def close(self) -> None:
        if self._h:
            self._lib.ddpio_writer_destroy(ctypes.c_void_p(self._h))
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# ---- pytree layer ----


def _flatten_with_paths(tree: Any):
    import jax

    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
    named = {}
    for path, leaf in leaves_with_paths:
        key = "/".join(str(p) for p in path) or "leaf"
        named[key] = np.asarray(leaf)
    return named, treedef


def save_pytree(path: str, tree: Any, writer: Optional[AsyncCheckpointWriter] = None):
    """Checkpoint any pytree of arrays (solver carry, Solution, params)."""
    named, _ = _flatten_with_paths(tree)
    if writer is not None:
        if not writer.submit(path, named):
            save_arrays(path, named)  # queue full: write synchronously
    else:
        save_arrays(path, named)


def load_pytree(path: str, like: Any) -> Any:
    """Restore a pytree checkpoint into the structure of ``like``."""
    import jax

    named = load_arrays(path)
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, leaf in leaves_with_paths:
        key = "/".join(str(q) for q in p) or "leaf"
        if key not in named:
            raise KeyError(f"checkpoint missing leaf '{key}'")
        a = named[key]
        leaves.append(a)
    return jax.tree_util.tree_unflatten(treedef, leaves)
