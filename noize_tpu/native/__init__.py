"""ctypes bindings for the native IO runtime (serde_native.cpp).

Auto-builds ``libnoize_serde.so`` with make/g++ on first import when
missing; the serde layer (noize_tpu.core.serde) falls back to NumPy IO if
neither the library nor a toolchain is available.

File format: 32-byte header (magic 'NZTFU', version, payload size, FNV-1a
checksum) + raw little-endian payload.  Writes are atomic
(tmp-file + rename) and can be queued on a background thread pool so
checkpoints overlap with device compute.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libnoize_serde.so")

_lib: Optional[ctypes.CDLL] = None


class NativeIOError(IOError):
    pass


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"], check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_DIR, "serde_native.cpp")
    stale = (os.path.exists(_SO) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(_SO))
    if stale:
        _build()  # make rebuilds on mtime; on failure keep the old .so
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.nz_write.restype = ctypes.c_int
    lib.nz_write.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint64]
    lib.nz_write_async.restype = ctypes.c_uint64
    lib.nz_write_async.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint64]
    lib.nz_wait.restype = ctypes.c_int
    lib.nz_wait.argtypes = [ctypes.c_uint64]
    lib.nz_pending.restype = ctypes.c_int
    lib.nz_read.restype = ctypes.c_int
    lib.nz_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint64]
    lib.nz_payload_size.restype = ctypes.c_int64
    lib.nz_payload_size.argtypes = [ctypes.c_char_p]
    lib.nz_checksum.restype = ctypes.c_uint64
    lib.nz_checksum.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    if hasattr(lib, "nz_obj_write"):  # absent only in a pre-v2 stale .so
        lib.nz_obj_write.restype = ctypes.c_int64
        lib.nz_obj_write.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
            ctypes.c_void_p, ctypes.c_uint64,
        ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def write_file(path: str, arr: np.ndarray):
    lib = _load()
    if lib is None:
        raise NativeIOError("native serde unavailable")
    arr = np.ascontiguousarray(arr)
    rc = lib.nz_write(path.encode(), arr.ctypes.data_as(ctypes.c_void_p),
                      arr.nbytes)
    if rc != 0:
        raise NativeIOError(f"nz_write({path}) failed rc={rc}")


def write_file_async(path: str, arr: np.ndarray) -> int:
    """Queue an atomic checked write on the native thread pool; returns a
    ticket for wait()."""
    lib = _load()
    if lib is None:
        raise NativeIOError("native serde unavailable")
    arr = np.ascontiguousarray(arr)
    return int(lib.nz_write_async(path.encode(),
                                  arr.ctypes.data_as(ctypes.c_void_p),
                                  arr.nbytes))


def wait(ticket: int = 0):
    lib = _load()
    if lib is None:
        return
    rc = lib.nz_wait(ticket)
    if rc != 0:
        raise NativeIOError(f"async write failed rc={rc}")


def pending() -> int:
    lib = _load()
    return 0 if lib is None else int(lib.nz_pending())


def obj_write(path: str, name: str, positions, normals, uvs,
              indices) -> int:
    """Buffered native Wavefront OBJ emission (text-identical to the
    numpy path in app/mesh_export.py, ~6× faster).  Returns bytes
    written; raises NativeIOError when the library (or the symbol, for a
    stale pre-v2 .so) is unavailable so callers can fall back."""
    lib = _load()
    if lib is None or not hasattr(lib, "nz_obj_write"):
        raise NativeIOError("native obj writer unavailable")
    pos = np.ascontiguousarray(positions, dtype=np.float32)
    nrm = np.ascontiguousarray(normals, dtype=np.float32)
    uv = np.ascontiguousarray(uvs, dtype=np.float32)
    tris = np.ascontiguousarray(indices, dtype=np.uint32).reshape(-1)
    n_verts = pos.shape[0]
    if pos.shape != (n_verts, 3) or nrm.shape != (n_verts, 3) \
            or uv.shape != (n_verts, 2) or tris.size % 3:
        raise NativeIOError("obj_write: inconsistent stream shapes")
    n = lib.nz_obj_write(
        path.encode(), name.encode(),
        pos.ctypes.data_as(ctypes.c_void_p),
        nrm.ctypes.data_as(ctypes.c_void_p),
        uv.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_uint64(n_verts),
        tris.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_uint64(tris.size // 3),
    )
    if n < 0:
        raise NativeIOError(f"nz_obj_write({path}) failed rc={n}")
    return int(n)


def read_file(path: str, dtype) -> np.ndarray:
    """Checked read; raises on checksum mismatch.  Returns a flat array.
    Falls back to raw-file interpretation for legacy (headerless) dumps."""
    lib = _load()
    if lib is None:
        raise NativeIOError("native serde unavailable")
    size = lib.nz_payload_size(path.encode())
    if size in (-1, -2):  # legacy raw file written by the numpy fallback
        return np.fromfile(path, dtype=np.dtype(dtype))
    if size < 0:
        raise NativeIOError(f"nz_payload_size({path}) rc={size}")
    out = np.empty(size // np.dtype(dtype).itemsize, dtype=np.dtype(dtype))
    rc = lib.nz_read(path.encode(), out.ctypes.data_as(ctypes.c_void_p), size)
    if rc == -4:
        raise NativeIOError(f"checksum mismatch reading {path}")
    if rc != 0:
        raise NativeIOError(f"nz_read({path}) failed rc={rc}")
    return out
