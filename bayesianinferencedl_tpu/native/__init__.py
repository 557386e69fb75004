"""ctypes bindings to the native C++ assembly library (native/).

The reference's native surface is its dependency stack (DOLFIN/PETSc, C++);
this module is the rebuild's in-repo native runtime: host-side mesh+assembly
preprocessing in C++ (libfinfem.so), with the NumPy implementation in
fem/dia.py kept as the portable fallback and correctness oracle.

The library is built on demand with `make -C native` (g++, no external
deps); `assemble_fin_dia_native` returns the same FinFEMDiaHost as the
NumPy path, pinned equal by tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_LIB_PATH = _REPO_ROOT / "native" / "build" / "libfinfem.so"
_lib: Optional[ctypes.CDLL] = None

N_REGIONS = 5
N_DIAG = 7


def build_native(force: bool = False) -> bool:
    """Compile libfinfem.so via make. Returns True on success."""
    if _LIB_PATH.exists() and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", str(_REPO_ROOT / "native")],
            check=True,
            capture_output=True,
            text=True,
        )
        return _LIB_PATH.exists()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_native() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not build_native():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.fin_grid_nodes.restype = ctypes.c_int
    lib.fin_grid_nodes.argtypes = [ctypes.c_int]
    dptr = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
    lib.fin_assemble_dia.restype = ctypes.c_int
    lib.fin_assemble_dia.argtypes = [ctypes.c_int, ctypes.c_int] + [dptr] * 6
    _lib = lib
    return lib


def native_available() -> bool:
    return load_native() is not None


def assemble_fin_dia_native(resolution: int, pad_to: int = 128):
    """Native-assembled stencil operator; same contract as
    fem.dia.assemble_fin_dia (which stays the oracle)."""
    from bayesianinferencedl_tpu.fem.dia import FinFEMDiaHost

    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable (make -C native failed)")

    n_grid = int(lib.fin_grid_nodes(resolution))
    n = ((n_grid + pad_to - 1) // pad_to) * pad_to
    ny = 16 * resolution

    comp_vals = np.zeros((n, N_DIAG, N_REGIONS))
    ext_mass = np.zeros((n, N_DIAG))
    fixed = np.zeros((n, N_DIAG))
    F_root = np.zeros(n)
    qoi = np.zeros((N_REGIONS, n))
    qoi_root = np.zeros(n)

    rc = lib.fin_assemble_dia(
        resolution, n, comp_vals.reshape(-1), ext_mass.reshape(-1), fixed.reshape(-1),
        F_root, qoi.reshape(-1), qoi_root,
    )
    if rc != 0:
        raise RuntimeError(f"fin_assemble_dia failed with code {rc}")

    offsets = np.array([-(ny + 2), -(ny + 1), -1, 0, 1, ny + 1, ny + 2], dtype=np.int64)
    return FinFEMDiaHost(
        offsets=offsets,
        comp_vals=comp_vals,
        ext_mass=ext_mass,
        fixed=fixed,
        F_root=F_root,
        qoi=qoi,
        qoi_root=qoi_root,
        n_grid=n_grid,
        resolution=resolution,
    )
