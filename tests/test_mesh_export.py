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


class _CornerMesh:
    """Real mesh streams plus %.7g formatting corners (negatives, exact
    zeros, big/tiny magnitudes)."""

    def __init__(self):
        m = _mesh()
        self.positions = np.asarray(m.positions).copy()
        self.positions[0] = [-1.5, 0.0, 12345678.0]
        self.positions[1] = [1e-8, -0.0, 2.0]
        self.normals = np.asarray(m.normals)
        self.tangents = np.asarray(m.tangents)
        self.uvs = np.asarray(m.uvs)
        self.indices = np.asarray(m.indices)


def _require_native():
    import pytest

    from noize_tpu import native

    if not native.available() or not hasattr(native._load(),
                                             "nz_obj_write"):
        pytest.skip("native obj writer unavailable")
    return native


class TestNativeObjWriter:
    def test_native_matches_fallback_byte_for_byte(self, tmp_path,
                                                   monkeypatch):
        """serde_native.cpp::nz_obj_write must emit EXACTLY the text
        to_obj's numpy fallback emits — consumers may diff exports across
        hosts with/without the toolchain.  The reference file is produced
        by the REAL fallback (native path stubbed out), so the format
        spec lives in exactly two places and this compares them."""
        native = _require_native()
        mesh = _CornerMesh()
        nat, ref = tmp_path / "nat.obj", tmp_path / "ref.obj"
        ME.to_obj(str(nat), mesh)

        def _unavailable(*a, **k):
            raise native.NativeIOError("stubbed out")

        monkeypatch.setattr(native, "obj_write", _unavailable)
        ME.to_obj(str(ref), mesh)
        assert nat.read_bytes() == ref.read_bytes()

    def test_to_obj_routes_through_native(self, tmp_path, monkeypatch):
        """The fast path must actually be the one taken when available."""
        native = _require_native()
        calls = []
        real = native.obj_write
        monkeypatch.setattr(
            native, "obj_write",
            lambda *a, **k: (calls.append(a[0]), real(*a, **k))[1])
        p = tmp_path / "tile.obj"
        ME.to_obj(str(p), _mesh())
        assert calls == [str(p)]
        assert p.stat().st_size > 0

    def test_long_mesh_name_not_truncated(self, tmp_path):
        """A >256-char object name must round-trip unmangled (no NUL
        bytes, no buffer-bound truncation in the native header path)."""
        _require_native()
        name = "x" * 400
        p = tmp_path / "long.obj"
        ME.to_obj(str(p), _mesh(), name=name)
        data = p.read_bytes()
        assert b"\x00" not in data
        assert data.startswith(b"o " + name.encode() + b"\n")


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
