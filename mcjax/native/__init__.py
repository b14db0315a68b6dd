"""ctypes bindings to the native C++ serial MC oracle (serial_mc.cpp).

Compiled on demand with g++ (no pybind11 dependency — plain C ABI + ctypes).
The library is the independent-language physics oracle used by the test suite
and the CPU baseline for speedup reporting, mirroring the reference's
serial-CPU comparison (pptx slide 14).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_SRC = os.path.join(os.path.dirname(__file__), "serial_mc.cpp")


class NativeUnavailable(RuntimeError):
    pass


def _build() -> str:
    out_dir = os.path.join(os.path.dirname(__file__), "_build")
    os.makedirs(out_dir, exist_ok=True)
    so_path = os.path.join(out_dir, "libserial_mc.so")
    if (os.path.exists(so_path)
            and os.path.getmtime(so_path) >= os.path.getmtime(_SRC)):
        return so_path
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", so_path + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        raise NativeUnavailable(f"building serial_mc failed: {e}") from e
    os.replace(so_path + ".tmp", so_path)
    return so_path


def get_lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build())
        dp = ctypes.POINTER(ctypes.c_double)
        lib.mcjax_total_energy.restype = ctypes.c_double
        lib.mcjax_total_energy.argtypes = [
            ctypes.c_int, ctypes.c_int, dp, ctypes.c_double, ctypes.c_int,
            ctypes.c_double, ctypes.POINTER(ctypes.c_int)]
        lib.mcjax_serial_run.restype = ctypes.c_longlong
        lib.mcjax_serial_run.argtypes = [
            ctypes.c_int, ctypes.c_int, dp, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_longlong, ctypes.c_uint64, ctypes.c_int,
            ctypes.c_double, ctypes.c_int]
        lib.mcjax_gr_histogram.restype = None
        lib.mcjax_gr_histogram.argtypes = [
            ctypes.c_int, ctypes.c_int, dp, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.POINTER(ctypes.c_longlong)]
        _LIB = lib
    return _LIB


_MODEL_KIND = {"lj": 0, "hard": 1}


def total_energy(positions: np.ndarray, box: float, model: str = "lj",
                 param: float | None = None) -> tuple[float, bool]:
    lib = get_lib()
    pos = np.ascontiguousarray(positions, dtype=np.float64)
    n, dim = pos.shape
    param = param if param is not None else (2.5 if model == "lj" else 1.0)
    ov = ctypes.c_int(0)
    e = lib.mcjax_total_energy(
        dim, n, pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), box,
        _MODEL_KIND[model], param, ctypes.byref(ov))
    return float(e), bool(ov.value)


def serial_run(positions: np.ndarray, box: float, beta: float, step: float,
               n_steps: int, seed: int, model: str = "lj",
               param: float | None = None,
               proposal: str = "gaussian") -> tuple[np.ndarray, int]:
    """Run the native serial Metropolis chain; returns (positions, accepted)."""
    lib = get_lib()
    pos = np.ascontiguousarray(positions, dtype=np.float64).copy()
    n, dim = pos.shape
    param = param if param is not None else (2.5 if model == "lj" else 1.0)
    acc = lib.mcjax_serial_run(
        dim, n, pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), box,
        beta, step, n_steps, seed, _MODEL_KIND[model], param,
        0 if proposal == "gaussian" else 1)
    return pos, int(acc)


def gr_histogram(positions: np.ndarray, box: float, r_max: float,
                 n_bins: int) -> np.ndarray:
    lib = get_lib()
    pos = np.ascontiguousarray(positions, dtype=np.float64)
    n, dim = pos.shape
    counts = np.zeros(n_bins, dtype=np.int64)
    lib.mcjax_gr_histogram(
        dim, n, pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), box,
        r_max, n_bins, counts.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)))
    return counts
