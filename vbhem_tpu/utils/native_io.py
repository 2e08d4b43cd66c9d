"""ctypes binding for the native C++ fixation loader
(`native/fixation_loader.cc`), with transparent build-on-first-use and
fallback to the pandas reader (:func:`.io.read_fixations`).

The native path parses + packs in one pass with no per-row Python
overhead — the production ingest path for large fixation tables; the
reference's equivalent host-side ingest is `src/util/read_xls_fixations.m`.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

from ..containers import SeqBatch

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libvbhem_io.so"))
_lib = None


def _load_library(build: bool = True):
    """Load (building if needed) the shared library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vbhem_parse_fixations.restype = ctypes.c_void_p
    lib.vbhem_parse_fixations.argtypes = [ctypes.c_char_p]
    lib.vbhem_error.restype = ctypes.c_char_p
    lib.vbhem_error.argtypes = [ctypes.c_void_p]
    lib.vbhem_num_subjects.restype = ctypes.c_int64
    lib.vbhem_num_subjects.argtypes = [ctypes.c_void_p]
    lib.vbhem_dim.restype = ctypes.c_int64
    lib.vbhem_dim.argtypes = [ctypes.c_void_p]
    lib.vbhem_subject_name.restype = ctypes.c_char_p
    lib.vbhem_subject_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.vbhem_num_trials.restype = ctypes.c_int64
    lib.vbhem_num_trials.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.vbhem_max_len.restype = ctypes.c_int64
    lib.vbhem_max_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.vbhem_fill_subject.restype = ctypes.c_int
    lib.vbhem_fill_subject.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64]
    lib.vbhem_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_library() is not None


def read_fixations_native(path: str, t_max: Optional[int] = None,
                          dtype=np.float64) -> Dict[str, SeqBatch]:
    """Native CSV parse + pack; same output contract as
    :func:`.io.read_fixations`.  Raises RuntimeError if the library
    cannot be built or the file cannot be parsed."""
    import jax.numpy as jnp

    lib = _load_library()
    if lib is None:
        raise RuntimeError("native loader unavailable (g++/make failed?)")
    handle = lib.vbhem_parse_fixations(path.encode())
    try:
        err = lib.vbhem_error(handle).decode()
        if err:
            raise RuntimeError(f"native loader: {err}: {path}")
        dim = int(lib.vbhem_dim(handle))
        out: Dict[str, SeqBatch] = {}
        for i in range(int(lib.vbhem_num_subjects(handle))):
            name = lib.vbhem_subject_name(handle, i).decode()
            n = int(lib.vbhem_num_trials(handle, i))
            tm = int(lib.vbhem_max_len(handle, i)) if t_max is None else t_max
            data = np.zeros((n, tm, dim), np.float64)
            lengths = np.zeros((n,), np.int64)
            rc = lib.vbhem_fill_subject(
                handle, i,
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), tm)
            if rc != 0:
                raise RuntimeError(f"native loader: fill failed ({rc})")
            out[name] = SeqBatch(x=jnp.asarray(data.astype(dtype)),
                                 lengths=jnp.asarray(lengths, jnp.int32))
        return out
    finally:
        lib.vbhem_free(handle)


def read_fixations_auto(path: str, t_max: Optional[int] = None,
                        dtype=np.float64) -> Dict[str, SeqBatch]:
    """Native loader for CSV when available, pandas otherwise (and
    always for Excel formats)."""
    from .io import read_fixations
    if path.endswith(".csv") and native_available():
        try:
            return read_fixations_native(path, t_max=t_max, dtype=dtype)
        except RuntimeError:
            pass
    return read_fixations(path, t_max=t_max, dtype=dtype)
