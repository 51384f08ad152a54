"""ctypes bindings for the native host runtime (csrc/nddms_native.cpp).

Loads ``libnddms_native.so`` (built by ``make -C csrc``; auto-built on
first use if a compiler is available) and exposes:

  * ``exact_sampler(...)`` — C++ series-method exact DDM sampler, the CPU
    oracle twin of ``ops/exact_sampler.py`` (reference:
    ``pyhddmjagsutils.py:47-176``);
  * ``parse_stahl_csv(path)`` — columnar reader for the Stahl data layout,
    the native ingest behind ``data/stahl.py``.

Everything degrades gracefully: ``available()`` is False when the library
cannot be built/loaded, and callers fall back to the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "libnddms_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO) and os.path.exists(
            os.path.join(_CSRC, "Makefile")):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.nddms_exact_sampler.argtypes = [
        ctypes.c_int64] + [ctypes.c_double] * 8 + [
        ctypes.c_uint64, ctypes.POINTER(ctypes.c_double)]
    lib.nddms_exact_sampler.restype = None
    lib.nddms_parse_stahl_csv.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double)]
    lib.nddms_parse_stahl_csv.restype = ctypes.c_int64
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def exact_sampler(n: int = 100, alpha: float = 1.0, tau: float = 0.4,
                  nu: float = 1.0, beta: float = 0.5,
                  range_tau: float = 0.0, range_beta: float = 0.0,
                  eta: float = 0.3, varsigma: float = 1.0,
                  seed: int = 0) -> np.ndarray:
    """Signed RTs from the C++ exact sampler (simulratcliff semantics)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable; use "
                           "ops.exact_sampler.simulate_exact instead")
    out = np.empty(n, np.float64)
    lib.nddms_exact_sampler(
        n, alpha, tau, nu, beta, range_tau, range_beta, eta, varsigma,
        seed, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def parse_stahl_csv(path: str, capacity: int = 1_000_000):
    """Native CSV ingest -> dict of numpy columns, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    subj = np.empty(capacity, np.int32)
    rt = np.empty(capacity, np.float64)
    resp = np.empty(capacity, np.int32)
    ne = np.empty(capacity, np.float64)
    pe = np.empty(capacity, np.float64)
    n = lib.nddms_parse_stahl_csv(
        path.encode(), capacity,
        subj.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        resp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ne.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        pe.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if n < 0:
        return None
    return {"subj_idx": subj[:n], "rt": rt[:n], "response": resp[:n],
            "pre_Ne": ne[:n], "pre_Pe": pe[:n]}
