"""ctypes bindings for the native IO runtime (native/recordio.cpp).

Loads libgslora_native.so if built (``make -C native``); callers fall back
to the pure-python reader (gslora_tpu.data.recordio) when absent.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libgslora_native.so")
_lib = None


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ri_open.restype = ctypes.c_void_p
    lib.ri_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.ri_close.argtypes = [ctypes.c_void_p]
    lib.ri_num_records.restype = ctypes.c_int64
    lib.ri_num_records.argtypes = [ctypes.c_void_p]
    lib.ri_keys.restype = ctypes.c_int64
    lib.ri_keys.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
    lib.ri_read.restype = ctypes.c_int64
    lib.ri_read.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                            ctypes.POINTER(ctypes.c_float),
                            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    lib.ri_read_batch.restype = ctypes.c_int
    lib.ri_read_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
    try:
        lib.id_decode_batch.restype = ctypes.c_int
        lib.id_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
    except AttributeError:  # older .so without the image decoder
        pass
    _lib = lib
    return lib


def decode_image_batch(paths: List[str], height: int, width: int,
                       threads: int = 4
                       ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Decode JPEG/PNG files into (n, 3, H, W) float32 /255 via the C++
    thread pool (native/imagedec.cpp). Returns (batch, ok_mask) — ok[i]
    False where the caller must fall back to PIL (resize needed,
    unsupported codec). None when the native library isn't built."""
    lib = load_library()
    if lib is None or not hasattr(lib, "id_decode_batch"):
        return None
    n = len(paths)
    out = np.zeros((n, 3, height, width), np.float32)
    ok = np.zeros(n, np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.id_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        height, width, threads,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out, ok.astype(bool)


def available() -> bool:
    return load_library() is not None


class NativeRecordReader:
    """Threaded batched record reads through the C++ runtime."""

    def __init__(self, rec_path: str, idx_path: Optional[str] = None,
                 n_threads: int = 4):
        lib = load_library()
        if lib is None:
            raise RuntimeError(
                "libgslora_native.so not built; run `make -C native`")
        self._lib = lib
        self._h = lib.ri_open(rec_path.encode(),
                              (idx_path or rec_path[:-4] + ".idx").encode())
        if not self._h:
            raise IOError(f"cannot open recordio pair for {rec_path}")
        self.n_threads = n_threads
        n = lib.ri_num_records(self._h)
        keys = np.zeros(n, np.int64)
        lib.ri_keys(self._h, keys.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)), n)
        self.keys = keys
        self._key_to_pos = {int(k): i for i, k in enumerate(keys)}

    def __len__(self):
        return len(self.keys)

    def read(self, pos: int) -> Tuple[float, bytes]:
        label = ctypes.c_float()
        cap = 1 << 16
        while True:
            buf = np.zeros(cap, np.uint8)
            n = self._lib.ri_read(
                self._h, pos, ctypes.byref(label),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
            if n < 0:
                raise IOError(f"record read failed at pos {pos}")
            if n <= cap:
                return float(label.value), buf[:n].tobytes()
            cap = int(n)

    def read_batch(self, positions) -> Tuple[np.ndarray, List[bytes]]:
        idxs = np.ascontiguousarray(positions, np.int64)
        n = len(idxs)
        labels = np.zeros(n, np.float32)
        starts = np.zeros(n, np.int64)
        lengths = np.zeros(n, np.int64)
        cap = 1 << 20
        while True:
            out = np.zeros(cap, np.uint8)
            rc = self._lib.ri_read_batch(
                self._h,
                idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
                starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                self.n_threads)
            if rc == 0:
                return labels, [
                    out[starts[j]:starts[j] + lengths[j]].tobytes()
                    for j in range(n)]
            if rc == -2:
                cap *= 4
                continue
            raise IOError("batched record read failed")

    def close(self):
        if self._h:
            self._lib.ri_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
