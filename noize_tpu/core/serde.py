"""Buffer store disk serialization — checkpoint/resume parity.

Reference: ``FileDirectory``/``FileObject``/``BinaryIO``/``PipelineSerdeManager``
(/root/reference/Pipeline/PipelineState/PipelineSerialization.cs:15-236).

Layout parity: a save root ``save__{name}_{version}/`` containing
``data/{buffer}.data`` raw little-endian dumps plus a ``files.json``
manifest mapping buffer name → file + element count/dtype/shape (the
reference stores element counts per container type; we also record shape
and dtype since our arrays are typed).

A C++ fast path (noize_tpu/native/serde.cpp) provides zero-copy mmap'd
reads/writes for large buffers when built; this module transparently falls
back to NumPy IO.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

MANIFEST = "files.json"

# Native file format (serde_native.cpp): 32-byte header = u64 magic 'NZTFU'
# (little-endian), u32 version, u32 reserved, u64 payload bytes, u64 FNV-1a
# checksum.  The NumPy fallback must recognise it so checkpoints written on
# a machine WITH the C++ toolchain restore on a machine without one.
_NATIVE_MAGIC = (0x4E5A544655).to_bytes(8, "little")
_NATIVE_HEADER_BYTES = 32


def _native():
    try:
        from .. import native as serde_native  # built lazily; optional

        return serde_native if serde_native.available() else None
    except Exception:
        return None


def _fnv1a(data: bytes) -> int:
    """FNV-1a 64 over the payload — mirrors serde_native.cpp::fnv1a.
    The hash chain is inherently sequential (xor-then-multiply per byte),
    so this is a Python loop: ~1-2 s per 16 MB map, acceptable for the
    exceptional no-toolchain fallback restore where it runs."""
    h = 1469598103934665603
    prime = 1099511628211
    mask = (1 << 64) - 1
    for b in memoryview(data):
        h = ((h ^ b) * prime) & mask
    return h


def _numpy_read(path: str, dtype) -> np.ndarray:
    """NumPy fallback read that understands both layouts: raw dumps from
    ``arr.tofile`` AND native-format files (NZTFU header + payload), so a
    checkpoint written with the C++ pool restores without the toolchain.
    Native payloads are checksum-verified exactly like the C++ reader
    (rc -4) — a corrupt checkpoint must fail loudly on every machine."""
    with open(path, "rb") as fh:
        head = fh.read(_NATIVE_HEADER_BYTES)
        if len(head) == _NATIVE_HEADER_BYTES and head[:8] == _NATIVE_MAGIC:
            nbytes = int.from_bytes(head[16:24], "little")
            checksum = int.from_bytes(head[24:32], "little")
            payload = fh.read(nbytes)
            if len(payload) != nbytes:
                raise IOError(f"truncated native checkpoint: {path}")
            if _fnv1a(payload) != checksum:
                raise IOError(f"checksum mismatch in checkpoint: {path}")
            return np.frombuffer(payload, dtype=np.dtype(dtype))
        fh.seek(0)
        return np.fromfile(fh, dtype=np.dtype(dtype))


@dataclass
class FileObject:
    """PipelineSerialization.cs:98-126 analog."""

    file_name: str
    count: int
    dtype: str
    shape: tuple


class FileDirectory:
    """The files.json manifest (PipelineSerialization.cs:15-96)."""

    def __init__(self, root: str):
        self.root = root
        self.entries: Dict[str, FileObject] = {}
        self._load()

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.root, MANIFEST)

    def _load(self):
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as fh:
                raw = json.load(fh)
            self.entries = {
                k: FileObject(v["fileName"], v["count"], v["dtype"], tuple(v["shape"]))
                for k, v in raw.items()
            }

    def flush(self):
        os.makedirs(self.root, exist_ok=True)
        with open(self.manifest_path, "w") as fh:
            json.dump(
                {
                    k: {
                        "fileName": v.file_name,
                        "count": v.count,
                        "dtype": v.dtype,
                        "shape": list(v.shape),
                    }
                    for k, v in self.entries.items()
                },
                fh,
                indent=1,
            )

    def __contains__(self, name: str) -> bool:
        return name in self.entries


class SerdeManager:
    """PipelineSerdeManager analog: dump/restore named buffers under a save
    root ``save__{alias}`` (PipelineStateManager.SetSavePath composes the
    alias from name+version — PipelineStateManager.cs:18-20)."""

    def __init__(self, base_dir: str, save_name: str = "default", version: str = "0"):
        self.root = os.path.join(base_dir, f"save__{save_name}_{version}")
        self.data_dir = os.path.join(self.root, "data")
        self.directory = FileDirectory(self.root)

    def _path_for(self, name: str) -> str:
        safe = name.replace("/", "_")
        return os.path.join(self.data_dir, f"{safe}.data")

    def save(self, name: str, array: np.ndarray, async_: bool = False):
        """Dump one buffer.  ``async_`` queues the write on the native
        thread pool (checkpoints overlap compute); call ``flush()`` to
        barrier."""
        os.makedirs(self.data_dir, exist_ok=True)
        arr = np.ascontiguousarray(array)
        path = self._path_for(name)
        nat = _native()
        if nat is not None:
            if async_:
                nat.write_file_async(path, arr)
            else:
                nat.write_file(path, arr)
        else:
            arr.tofile(path)
        self.directory.entries[name] = FileObject(
            os.path.basename(path), arr.size, str(arr.dtype), arr.shape
        )
        self.directory.flush()

    def flush(self):
        """Barrier for async saves (no-op without the native pool)."""
        nat = _native()
        if nat is not None:
            nat.wait(0)

    def exists(self, name: str) -> bool:
        return name in self.directory and os.path.exists(self._path_for(name))

    def load(self, name: str) -> Optional[np.ndarray]:
        """Restore a buffer; None if absent (GetBuffer auto-restore hook —
        PipelineStateManager.cs:63-71)."""
        if not self.exists(name):
            return None
        fo = self.directory.entries[name]
        path = self._path_for(name)
        nat = _native()
        if nat is not None:
            flat = nat.read_file(path, fo.dtype)
        else:
            flat = _numpy_read(path, fo.dtype)
        if flat.size != fo.count:
            raise IOError(
                f"corrupt checkpoint for {name!r}: {flat.size} != {fo.count}"
            )
        return flat.reshape(fo.shape)
