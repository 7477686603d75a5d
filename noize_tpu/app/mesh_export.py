"""Mesh file export — Wavefront OBJ (+ raw NPZ) writers for the emitted
vertex/index streams.

The reference hands its meshes straight to Unity's renderer/collider
(``Mesh/Stage/MeshTileStage.cs:48-57``, ``Scripts/MeshBakery.cs``); outside
an engine the equivalent hand-off is a standard interchange file.  OBJ
carries exactly the channels our generators emit — positions, normals,
uvs (tangents have no OBJ slot; NPZ keeps all five streams losslessly).

Works with both emission layouts (``MeshArrays`` and the component-major
``MeshPlanes`` — anything exposing positions/normals/uvs/indices).
"""

from __future__ import annotations

import numpy as np


def _streams(mesh):
    pos = np.asarray(mesh.positions, np.float32)
    nrm = np.asarray(mesh.normals, np.float32)
    uv = np.asarray(mesh.uvs, np.float32)
    # widen before the 1-based shift in to_obj: uint16 streams top out at
    # flat index 65535, which idx + 1 would wrap to 0
    idx = np.asarray(mesh.indices).astype(np.int64).reshape(-1, 3)
    return pos, nrm, uv, idx


def to_obj(path: str, mesh, name: str = "noize_tile") -> None:
    """Write a Wavefront OBJ with v/vt/vn streams and f v/vt/vn faces.

    Triangle winding is preserved as emitted (SquareGridHeightMap.cs:96-103
    order); OBJ face indices are 1-based.  Uses a single shared index per
    vertex (our streams are grid-aligned, so position/uv/normal ids match).

    Prefers the native buffered writer (serde_native.cpp::nz_obj_write,
    ~6× faster, text-identical); falls back to numpy savetxt when the
    library isn't available.
    """
    pos, nrm, uv, idx = _streams(mesh)
    try:
        from ..native import obj_write

        obj_write(path, name, pos, nrm, uv, idx)
        return
    except Exception:
        pass  # any native failure (missing toolchain/stale .so): numpy path
    faces = idx + 1
    with open(path, "w") as fh:
        fh.write(f"o {name}\n")
        np.savetxt(fh, pos, fmt="v %.7g %.7g %.7g")
        np.savetxt(fh, uv, fmt="vt %.7g %.7g")
        np.savetxt(fh, nrm, fmt="vn %.7g %.7g %.7g")
        # each corner repeats its id as position/uv/normal: f v/v/v ...
        np.savetxt(
            fh, np.repeat(faces, 3, axis=1),
            fmt="f %d/%d/%d %d/%d/%d %d/%d/%d",
        )


def to_npz(path: str, mesh) -> None:
    """Lossless dump of all five streams (positions/normals/tangents/uvs/
    indices) — the round-trippable companion to ``to_obj``."""
    np.savez_compressed(
        path,
        positions=np.asarray(mesh.positions),
        normals=np.asarray(mesh.normals),
        tangents=np.asarray(mesh.tangents),
        uvs=np.asarray(mesh.uvs),
        indices=np.asarray(mesh.indices),
    )


def from_npz(path: str):
    """Load a ``to_npz`` dump back into a ``MeshArrays``."""
    from ..ops.mesh import MeshArrays

    with np.load(path) as z:
        return MeshArrays(
            positions=z["positions"], normals=z["normals"],
            tangents=z["tangents"], uvs=z["uvs"], indices=z["indices"],
        )
