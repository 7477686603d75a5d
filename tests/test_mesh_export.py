"""Mesh file export tests — OBJ structure and NPZ round-trip."""

import numpy as np
import jax.numpy as jnp

from noize_tpu.app import mesh_export as ME
from noize_tpu.ops import mesh as M

RNG = np.random.default_rng(17)


_H = RNG.uniform(0, 1, (8, 8)).astype(np.float32)


def _mesh(r=4, inp=8, planes=False):
    fn = (M.heightmap_mesh_overshoot_planes if planes
          else M.heightmap_mesh_overshoot)
    return fn(jnp.asarray(_H[:inp, :inp]), r, inp, 100.0, 50.0)


class TestObjExport:
    def test_obj_counts_and_faces(self, tmp_path):
        mesh = _mesh()
        p = tmp_path / "tile.obj"
        ME.to_obj(str(p), mesh)
        lines = p.read_text().splitlines()
        v = [l for l in lines if l.startswith("v ")]
        vt = [l for l in lines if l.startswith("vt ")]
        vn = [l for l in lines if l.startswith("vn ")]
        f = [l for l in lines if l.startswith("f ")]
        assert len(v) == mesh.vertex_count
        assert len(vt) == mesh.vertex_count
        assert len(vn) == mesh.vertex_count
        assert len(f) == mesh.index_count // 3
        # faces are 1-based and in range; corner ids repeat as p/t/n
        first = f[0].split()[1:]
        for corner in first:
            a, b, c = map(int, corner.split("/"))
            assert a == b == c and 1 <= a <= len(v)
        # first vertex line round-trips the first position
        got = np.array(v[0][2:].split(), dtype=float)
        np.testing.assert_allclose(got, np.asarray(mesh.positions)[0],
                                   rtol=1e-5, atol=1e-6)

    def test_obj_from_planes_layout(self, tmp_path):
        """MeshPlanes exports identically (same streams via properties)."""
        ma = _mesh(planes=False)
        mp = _mesh(planes=True)
        pa, pp = tmp_path / "a.obj", tmp_path / "p.obj"
        ME.to_obj(str(pa), ma)
        ME.to_obj(str(pp), mp)
        a_lines = [l for l in pa.read_text().splitlines()
                   if not l.startswith("vn ")]
        p_lines = [l for l in pp.read_text().splitlines()
                   if not l.startswith("vn ")]
        assert a_lines == p_lines  # positions/uvs/faces textually equal


class TestNativeObjWriter:
    def test_native_matches_numpy_byte_for_byte(self, tmp_path):
        """serde_native.cpp::nz_obj_write must emit EXACTLY the text the
        numpy fallback emits (same %.7g formatting) — consumers may diff
        exports across hosts with/without the toolchain."""
        import pytest

        from noize_tpu import native

        if not native.available() or not hasattr(native._load(),
                                                 "nz_obj_write"):
            pytest.skip("native obj writer unavailable")
        mesh = _mesh()
        pos, nrm, uv, idx = ME._streams(mesh)
        # negative coords, tiny normals components, exact integers — the
        # formatting corners %.7g has to agree on
        pos = pos.copy()
        pos[0] = [-1.5, 0.0, 12345678.0]
        pos[1] = [1e-8, -0.0, 2.0]
        nat, ref = tmp_path / "nat.obj", tmp_path / "ref.obj"
        native.obj_write(str(nat), "noize_tile", pos, nrm, uv, idx)
        faces = idx + 1
        with open(ref, "w") as fh:
            fh.write("o noize_tile\n")
            np.savetxt(fh, pos, fmt="v %.7g %.7g %.7g")
            np.savetxt(fh, uv, fmt="vt %.7g %.7g")
            np.savetxt(fh, nrm, fmt="vn %.7g %.7g %.7g")
            np.savetxt(fh, np.repeat(faces, 3, axis=1),
                       fmt="f %d/%d/%d %d/%d/%d %d/%d/%d")
        assert nat.read_bytes() == ref.read_bytes()

    def test_to_obj_routes_through_native(self, tmp_path):
        """to_obj should produce the same file whichever path runs."""
        mesh = _mesh()
        p = tmp_path / "tile.obj"
        ME.to_obj(str(p), mesh)
        assert p.stat().st_size > 0


class _StubMesh:
    """Minimal stream carrier for layout-independent export tests."""

    def __init__(self, n, indices):
        self.positions = np.zeros((n, 3), np.float32)
        self.normals = np.tile([0, 1, 0], (n, 1)).astype(np.float32)
        self.tangents = np.zeros((n, 4), np.float32)
        self.uvs = np.zeros((n, 2), np.float32)
        self.indices = indices


class TestObjUint16Boundary:
    def test_max_uint16_index_does_not_wrap(self, tmp_path):
        """The 1-based OBJ shift must not wrap uint16 65535 → 0 (the
        documented PositionStream16 ceiling is exactly 65536 vertices)."""
        idx = np.array([65533, 65534, 65535], np.uint16)
        p = tmp_path / "big.obj"
        ME.to_obj(str(p), _StubMesh(65536, idx))
        face = [l for l in p.read_text().splitlines()
                if l.startswith("f ")][0]
        assert "65536/65536/65536" in face and "/0/" not in face


class TestNpzRoundTrip:
    def test_round_trip(self, tmp_path):
        mesh = _mesh()
        p = tmp_path / "tile.npz"
        ME.to_npz(str(p), mesh)
        back = ME.from_npz(str(p))
        for f in ("positions", "normals", "tangents", "uvs", "indices"):
            np.testing.assert_array_equal(
                np.asarray(getattr(back, f)), np.asarray(getattr(mesh, f)),
                err_msg=f)
        assert back.indices.dtype == np.asarray(mesh.indices).dtype
