"""Native (C++) runtime components.

The reference's native core is its C solver (compiled per problem by the
Maxima generator); here the compute path is XLA, and the native layer covers
the *runtime around* the device loop:

* :mod:`ddp_io` (``libddp_io.so``): binary tensor-archive checkpoint format
  with CRC validation and an asynchronous background-writer thread -- the
  checkpoint/resume subsystem the reference lacks entirely (SURVEY.md
  section 5).

Build on demand with :func:`build` (g++, no external deps); all Python entry
points fall back to a pure-numpy implementation when the shared library is
unavailable.
"""

from .ckpt import (  # noqa: F401
    AsyncCheckpointWriter,
    load_arrays,
    load_pytree,
    native_available,
    save_arrays,
    save_pytree,
)
from .build import build, library_path  # noqa: F401
