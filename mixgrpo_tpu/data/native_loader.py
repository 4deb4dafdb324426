"""ctypes bridge to the native cache reader (csrc/cacheloader.cpp).

Python parses each safetensors shard header once (offsets/shapes); the C++
library owns the hot path: mmap, madvise readahead, and batched f16->f32
row gather without numpy temporaries.  Falls back to pure Python reads when
a compiler is unavailable (``NativeShardReader.available()``).
"""

from __future__ import annotations

import ctypes
import json
import os
import struct
import subprocess
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_lib() -> Optional[str]:
    root = _repo_root()
    src = os.path.join(root, "csrc", "cacheloader.cpp")
    if not os.path.exists(src):
        return None
    out_dir = os.path.join(root, "csrc", "build")
    os.makedirs(out_dir, exist_ok=True)
    so = os.path.join(out_dir, "libcacheloader.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", so, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except Exception:
        return None
    return so


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    so = _build_lib()
    if so is None:
        _BUILD_FAILED = True
        return None
    lib = ctypes.CDLL(so)
    lib.cl_open.restype = ctypes.c_void_p
    lib.cl_open.argtypes = [ctypes.c_char_p]
    lib.cl_close.argtypes = [ctypes.c_void_p]
    lib.cl_size.restype = ctypes.c_uint64
    lib.cl_size.argtypes = [ctypes.c_void_p]
    lib.cl_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64]
    lib.cl_read.restype = ctypes.c_int
    lib.cl_read.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_void_p
    ]
    lib.cl_gather_f16_rows.restype = ctypes.c_int
    lib.cl_gather_f16_rows.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return lib


def parse_safetensors_header(path: str) -> Dict[str, dict]:
    """Tensor name -> {dtype, shape, data_offsets (absolute bytes)}."""
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(n))
    base = 8 + n
    out = {}
    for name, info in header.items():
        if name == "__metadata__":
            continue
        s, e = info["data_offsets"]
        out[name] = {
            "dtype": info["dtype"],
            "shape": tuple(info["shape"]),
            "start": base + s,
            "end": base + e,
        }
    return out


class NativeShardReader:
    """Zero-copy row reader over one safetensors shard (f16 tensors)."""

    def __init__(self, path: str):
        lib = _get_lib()
        assert lib is not None, "native cacheloader unavailable"
        self._lib = lib
        self._h = lib.cl_open(path.encode())
        assert self._h, f"cl_open failed: {path}"
        self.tensors = parse_safetensors_header(path)

    @staticmethod
    def available() -> bool:
        return _get_lib() is not None

    def _row_layout(self, name: str) -> Tuple[int, int, int]:
        info = self.tensors[name]
        assert info["dtype"] == "F16", info
        shape = info["shape"]
        row_elems = int(np.prod(shape[1:]))
        return info["start"], row_elems * 2, row_elems

    def gather_rows(self, name: str, rows: Sequence[int]) -> np.ndarray:
        """Fetch rows as float32, shape (len(rows), *tensor.shape[1:])."""
        start, stride, row_elems = self._row_layout(name)
        rows_arr = np.ascontiguousarray(rows, np.int64)
        out = np.empty((len(rows_arr), row_elems), np.float32)
        rc = self._lib.cl_gather_f16_rows(
            self._h, start, stride, row_elems,
            rows_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(rows_arr),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        assert rc == 0, f"cl_gather_f16_rows rc={rc}"
        shape = self.tensors[name]["shape"]
        return out.reshape(len(rows_arr), *shape[1:])

    def prefetch_rows(self, name: str, rows: Sequence[int]) -> None:
        start, stride, _ = self._row_layout(name)
        for r in rows:
            self._lib.cl_prefetch(self._h, start + int(r) * stride, stride)

    def close(self):
        if self._h:
            self._lib.cl_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass
