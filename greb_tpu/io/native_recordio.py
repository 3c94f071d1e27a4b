"""ctypes binding to the native record-IO library (native/recordio.cpp).

Falls back to None if the shared library hasn't been built; binio.py then
uses the pure-NumPy path.  Build with:  make -C greb_tpu/native
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "native",
                         "librecordio.so")


class NativeRecordIO:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.greb_read_records.restype = ctypes.c_int
        lib.greb_read_records.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.greb_write_records.restype = ctypes.c_int
        lib.greb_write_records.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.greb_file_records.restype = ctypes.c_int64
        lib.greb_file_records.argtypes = [ctypes.c_char_p, ctypes.c_int64]

    @classmethod
    def try_load(cls) -> Optional["NativeRecordIO"]:
        path = os.path.abspath(_LIB_PATH)
        if not os.path.exists(path):
            return None
        try:
            return cls(ctypes.CDLL(path))
        except OSError:
            return None

    def read(self, path: str, recl: int, indices: Sequence[int],
             nthreads: int = 4) -> np.ndarray:
        idx = np.asarray(list(indices), dtype=np.int64)
        out = np.empty(len(idx) * recl, dtype=np.uint8)
        rc = self._lib.greb_read_records(
            path.encode(), recl,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nthreads)
        if rc != 0:
            raise OSError(-rc, os.strerror(-rc), path)
        return out

    def write(self, path: str, recl: int, start: int, data: np.ndarray) -> None:
        buf = np.ascontiguousarray(data).view(np.uint8).ravel()
        nrec = buf.size // recl
        rc = self._lib.greb_write_records(
            path.encode(), recl, start,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nrec)
        if rc != 0:
            raise OSError(-rc, os.strerror(-rc), path)

    def n_records(self, path: str, recl: int) -> int:
        n = self._lib.greb_file_records(path.encode(), recl)
        if n < 0:
            raise OSError(int(-n), os.strerror(int(-n)), path)
        return int(n)
