"""ctypes bindings for the native IO runtime (native/basetpu_io.cpp).

Loads libbasetpu_io.so (building it on first use if a toolchain is
present) and exposes:
  parse_table(path) -> (np.ndarray [rows, cols] float64, header | None)
  AsyncWriter(path) -> non-blocking append-only line writer
Falls back to pure-numpy implementations when the library cannot be
built, so the framework never hard-requires the native component.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbasetpu_io.so")
_lib = None
_lib_lock = threading.Lock()


def _load() -> ctypes.CDLL | None:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.basetpu_parse_table.restype = ctypes.c_void_p
        lib.basetpu_parse_table.argtypes = [ctypes.c_char_p]
        lib.basetpu_table_rows.restype = ctypes.c_int64
        lib.basetpu_table_rows.argtypes = [ctypes.c_void_p]
        lib.basetpu_table_cols.restype = ctypes.c_int64
        lib.basetpu_table_cols.argtypes = [ctypes.c_void_p]
        lib.basetpu_table_header.restype = ctypes.c_char_p
        lib.basetpu_table_header.argtypes = [ctypes.c_void_p]
        lib.basetpu_table_copy.restype = None
        lib.basetpu_table_copy.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)
        ]
        lib.basetpu_table_free.restype = None
        lib.basetpu_table_free.argtypes = [ctypes.c_void_p]
        lib.basetpu_writer_open.restype = ctypes.c_void_p
        lib.basetpu_writer_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.basetpu_writer_write.restype = None
        lib.basetpu_writer_write.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64
        ]
        lib.basetpu_writer_pending.restype = ctypes.c_int64
        lib.basetpu_writer_pending.argtypes = [ctypes.c_void_p]
        lib.basetpu_writer_close.restype = None
        lib.basetpu_writer_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def parse_table(path: str) -> tuple[np.ndarray, str | None]:
    """Parse a whitespace numeric table (optional header line / '#'
    comments).  Native fast path; numpy fallback."""
    lib = _load()
    if lib is None:
        return _parse_table_py(path)
    handle = lib.basetpu_parse_table(path.encode())
    if not handle:
        raise ValueError(f"failed to parse table: {path}")
    try:
        rows = lib.basetpu_table_rows(handle)
        cols = lib.basetpu_table_cols(handle)
        out = np.empty((rows, cols), np.float64)
        if rows and cols:
            lib.basetpu_table_copy(
                handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            )
        hdr = lib.basetpu_table_header(handle)
        header = hdr.decode().strip() if hdr else None
        return out, header
    finally:
        lib.basetpu_table_free(handle)


def _parse_table_py(path: str) -> tuple[np.ndarray, str | None]:
    header = None
    rows = []
    with open(path) as f:
        for i, line in enumerate(f):
            s = line.strip()
            if not s or s.startswith("#"):
                continue
            try:
                rows.append([float(x) for x in s.split()])
            except ValueError:
                if header is None and not rows:
                    header = s
                else:
                    raise
    return np.asarray(rows, np.float64), header


class AsyncWriter:
    """Non-blocking append-only line writer (native thread when
    available, direct writes otherwise)."""

    def __init__(self, path: str, append: bool = False):
        self._lib = _load()
        self._handle = None
        self._fh = None
        if self._lib is not None:
            self._handle = self._lib.basetpu_writer_open(
                path.encode(), 1 if append else 0
            )
        if not self._handle:
            self._lib = None
            self._fh = open(path, "ab" if append else "wb")

    def write(self, line: str) -> None:
        data = line.encode()
        if self._lib is not None:
            self._lib.basetpu_writer_write(self._handle, data, len(data))
        else:
            self._fh.write(data)

    def pending(self) -> int:
        if self._lib is not None:
            return int(self._lib.basetpu_writer_pending(self._handle))
        return 0

    def close(self) -> None:
        if self._lib is not None and self._handle:
            self._lib.basetpu_writer_close(self._handle)
            self._handle = None
        if self._fh:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
