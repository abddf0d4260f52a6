"""ctypes loader for the optional C++ host-runtime extension (csrc/).

The extension accelerates construction-time host work (graph automorphism
enumeration for the symmetry/"twists" subsystem). Everything has a pure
Python fallback; this module returns None from its entry points when the
shared library is absent so callers can fall back silently.

Build: `make -C csrc` (produces csrc/libqgt_native.so).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.path.join(here, "csrc", "libqgt_native.so"),
        os.path.join(os.path.dirname(__file__), "libqgt_native.so"),
    ]
    for path in candidates:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.qgt_automorphisms.restype = ctypes.c_longlong
                lib.qgt_automorphisms.argtypes = [
                    ctypes.c_int,                      # n
                    ctypes.POINTER(ctypes.c_uint8),    # adjacency n*n
                    ctypes.POINTER(ctypes.c_int),      # out perms buffer
                    ctypes.c_longlong,                 # out capacity (ints)
                ]
                _LIB = lib
                return _LIB
            except OSError:
                continue
    return None


def graph_automorphisms(num_qubits: int, adj: List[set]) -> Optional[List[List[int]]]:
    """Enumerate graph automorphisms via the C++ extension; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = num_qubits
    flat = (ctypes.c_uint8 * (n * n))()
    for i, nbrs in enumerate(adj):
        for j in nbrs:
            flat[i * n + j] = 1
    cap = 4_000_000  # up to cap//n permutations
    out = (ctypes.c_int * cap)()
    count = lib.qgt_automorphisms(n, flat, out, cap)
    if count < 0:  # overflow or error -> let the caller fall back
        return None
    perms = []
    for k in range(count):
        perms.append([out[k * n + j] for j in range(n)])
    perms.sort()
    return perms or [[i for i in range(n)]]
