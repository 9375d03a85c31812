"""Native (C++) runtime components.

The reference's single native dependency is the external CNS Fortran suite
(the solver — reimplemented on TPU in ops/ + solver/). The remaining
host-side hot paths — parsing large whitespace IF matrices and PDB emission —
get a C++ fast path here, loaded via ctypes with a pure-Python fallback.

Build: `make -C chromosome3d_tpu/native` (or `python -m chromosome3d_tpu.native.build`).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(__file__)
    for name in ("libc3d_native.so",):
        path = os.path.join(here, name)
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.c3d_parse_matrix.restype = ctypes.c_longlong
                lib.c3d_parse_matrix.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.c_longlong,
                ]
                lib.c3d_matrix_dims.restype = ctypes.c_longlong
                lib.c3d_matrix_dims.argtypes = [ctypes.c_char_p]
                lib.c3d_write_ca_pdb_v2.restype = ctypes.c_int32
                lib.c3d_write_ca_pdb_v2.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.c_longlong,
                    ctypes.c_char_p,
                    ctypes.c_char_p,
                    ctypes.c_int32,
                ]
                _LIB = lib
            except (OSError, AttributeError):
                # missing symbol = stale .so from an older ABI; rebuild needed
                _LIB = None
            break
    return _LIB


def available() -> bool:
    return _load() is not None


def parse_matrix(path: str) -> Optional[np.ndarray]:
    """Parse a whitespace-float matrix file; None if the native lib is absent
    or the file is not a well-formed square grid of numeric tokens with
    uniform row widths (caller falls back to Python, which applies the same
    acceptance rule and raises the descriptive error — so behavior is
    identical with or without the .so built)."""
    lib = _load()
    if lib is None:
        return None
    side = lib.c3d_matrix_dims(path.encode())
    if side <= 0:
        return None
    n = side * side
    buf = np.empty(n, dtype=np.float64)
    got = lib.c3d_parse_matrix(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n
    )
    if got != side:
        return None
    return buf.reshape(side, side)


def write_ca_pdb(
    path: str,
    coords: np.ndarray,
    header: str = "",
    resname: str = "MET",
    connect: bool = True,
) -> bool:
    """Native CA-bead PDB emission (byte-identical to io.pdb.write_ca_pdb;
    parity-tested). header: pre-formatted REMARK lines incl. trailing
    newlines. Returns False when the library is absent or the write failed —
    the caller falls back to the Python writer."""
    lib = _load()
    if lib is None:
        return False
    xyz = np.ascontiguousarray(coords, dtype=np.float64)
    if xyz.ndim != 2 or xyz.shape[1] != 3:
        return False
    rc = lib.c3d_write_ca_pdb_v2(
        str(path).encode(),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        xyz.shape[0],
        header.encode(),
        resname.encode(),
        1 if connect else 0,
    )
    return rc == 0
