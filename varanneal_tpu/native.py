"""ctypes bindings for the native C++ engine (native/valib.cpp).

Builds the shared library on demand with g++ (no pybind11 in this
environment — plain C ABI + ctypes as the Python<->C++ boundary). See
valib.cpp for what the native side provides and why.
"""

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parent.parent
_SRC = _REPO / "native" / "valib.cpp"
_SO = _REPO / "native" / "libvalib.so"
_ABI = 2

_lib = None


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           str(_SRC), "-o", str(_SO)]
    subprocess.run(cmd, check=True, capture_output=True)


def load(rebuild: bool = False):
    """Load (building if needed) the native library. Raises RuntimeError if
    a toolchain is unavailable."""
    global _lib
    if _lib is not None and not rebuild:
        return _lib
    if rebuild or not _SO.exists() or (
            _SRC.exists() and _SO.stat().st_mtime < _SRC.stat().st_mtime):
        try:
            _build()
        except (OSError, subprocess.CalledProcessError) as e:
            raise RuntimeError(f"cannot build native valib: {e}") from e
    lib = ctypes.CDLL(str(_SO))
    if lib.valib_abi_version() != _ABI:
        _build()
        lib = ctypes.CDLL(str(_SO))
    sig = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.l96_trap_action_grad.restype = ctypes.c_double
    lib.l96_trap_action_grad.argtypes = sig
    lib.l96_sh_action_grad.restype = ctypes.c_double
    lib.l96_sh_action_grad.argtypes = sig
    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except RuntimeError:
        return False


def l96_trap_action_grad(xp, N, D, Y, lidx, stride, rm, rf, dt,
                         est_F=True, F_fixed=0.0):
    """Native analytic action+gradient for Lorenz-96 / trapezoid / scalar R.

    xp: flat (N*D [+1]) decision vector; Y: (n_data, L). Returns (A, grad).
    """
    lib = load()
    xp = np.ascontiguousarray(xp, dtype=np.float64)
    Y = np.ascontiguousarray(Y, dtype=np.float64)
    lidx = np.ascontiguousarray(lidx, dtype=np.int32)
    n_data, L = Y.shape
    grad = np.zeros(N * D + (1 if est_F else 0), dtype=np.float64)
    A = lib.l96_trap_action_grad(
        xp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        N, D,
        Y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_data,
        lidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        L, stride, float(rm), float(rf), float(dt),
        1 if est_F else 0, float(F_fixed),
        grad.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return A, grad


def l96_sh_action_grad(xp, N_f, D, Y, lidx, stride, rm, rf, dt,
                       est_F=True, F_fixed=0.0):
    """Native analytic Hermite–Simpson action+gradient for Lorenz-96 /
    scalar R on the doubled grid (N_f = 2*N_base - 1 rows; ``dt`` = the
    FULL interval h over [2m, 2m+2]; observations at rows n*2*stride).

    xp: flat (N_f*D [+1]) decision vector; Y: (n_data, L).
    Returns (A, grad)."""
    lib = load()
    xp = np.ascontiguousarray(xp, dtype=np.float64)
    Y = np.ascontiguousarray(Y, dtype=np.float64)
    lidx = np.ascontiguousarray(lidx, dtype=np.int32)
    n_data, L = Y.shape
    grad = np.zeros(N_f * D + (1 if est_F else 0), dtype=np.float64)
    A = lib.l96_sh_action_grad(
        xp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        N_f, D,
        Y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_data,
        lidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        L, stride, float(rm), float(rf), float(dt),
        1 if est_F else 0, float(F_fixed),
        grad.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return A, grad
