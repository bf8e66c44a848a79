"""Debug printing & parameter introspection.

Counterparts of the reference's console tooling:

* ``print_params``: the bound-parameter dump ``printParams``
  (``iLQG.c:45-55``) for a params pytree (the reference's ``paramdesc[]``
  table is our pytree structure).
* ``format_vec`` / ``format_mat``: ``printVec``/``printMat``/``printTri``
  (``printMat.c:7-70``) -- the reference stores symmetric matrices as packed
  upper triangles purely as a CPU memory optimization; here matrices are
  dense, so a triangle printer is just a masked dense print.
* ``debug_print_every``: in-graph tracing via ``jax.debug.print`` gated by
  the solver's ``debug_level`` convention.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def format_vec(v, name: str = "") -> str:
    v = np.asarray(v)
    body = " ".join(f"{x: .6g}" for x in v.ravel())
    return f"{name}= [{body}]" if name else f"[{body}]"


def format_mat(m, name: str = "", tri: bool = False) -> str:
    m = np.asarray(m)
    lines = []
    for i, row in enumerate(m):
        if tri:
            row = [row[j] if j >= i else 0.0 for j in range(len(row))]
        lines.append("  " + " ".join(f"{x: .6g}" for x in row))
    head = f"{name}=\n" if name else ""
    return head + "\n".join(lines)


def print_params(params: Any, k: int = 0) -> str:
    """Human-readable dump of a params pytree (``printParams``, iLQG.c:45-55).

    Time-varying arrays (the reference's ``[k]``-indexed, size -1 entries)
    print their value at step ``k``.
    """
    lines = []
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        a = np.asarray(leaf)
        if a.ndim == 0 or a.size == 1:
            lines.append(f"{name}= {float(a.ravel()[0]):g}")
        elif a.ndim == 1 and a.size > 8:
            lines.append(f"{name}[k]= {float(a[min(k, a.size - 1)]):g}")
        else:
            lines.append(format_vec(a, name))
    out = "\n".join(lines)
    print(out)
    return out
