"""Core layer tests: tile geometry, state store, serde checkpoint."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from noize_tpu.core.serde import SerdeManager
from noize_tpu.core.store import PipelineStateManager
from noize_tpu.core.tiles import TileRequest, TileSetMeta

RNG = np.random.default_rng(17)


class TestTileGeometry:
    def test_mesh_resolution(self):
        # MeshTileGenerator defaults: tileRes=1000, tileSize=1000, margin=5
        m = TileSetMeta(tile_res=1000, tile_size=1000, generator_res=1020,
                        height=1000, margin=5)
        assert m.patch_res == 1.0
        assert m.mesh_resolution == 1010  # 1000 + 2·int(5·1)
        assert m.margin_verts == 5
        assert m.margin_ws == 5.0

    def test_fractional_patch_res(self):
        # tileRes 512 over tileSize 1000: patchRes .512 → 2·int(5·.512)=4
        m = TileSetMeta(tile_res=512, tile_size=1000, generator_res=520, margin=5)
        assert m.mesh_resolution == 512 + 2 * int(5 * 0.512)

    def test_validate(self):
        with pytest.raises(ValueError):
            TileSetMeta(tile_res=100, tile_size=100, generator_res=100,
                        margin=5).validate()

    def test_buffer_name(self):
        m = TileSetMeta(tile_res=1000, tile_size=1000, generator_res=1020)
        assert m.buffer_name((2, 3), "TERRAIN_HEIGHT") == \
            "2000_3000__1020__TERRAIN_HEIGHT"

    def test_tile_origin(self):
        m = TileSetMeta(tile_res=512, tile_size=512, generator_res=520)
        assert m.tile_origin((1, -2)) == (512, -1024)


class TestStateManager:
    def test_get_or_create_with_factory(self):
        sm = PipelineStateManager()
        calls = []
        v = sm.get_buffer("a", factory=lambda: calls.append(1) or jnp.zeros(4))
        v2 = sm.get_buffer("a", factory=lambda: calls.append(1) or jnp.ones(4))
        assert len(calls) == 1 and v is v2

    def test_callbacks(self):
        sm = PipelineStateManager()
        seen = []
        sm.register_callback("k", lambda n, v: seen.append((n, v)))
        sm.set_buffer("k", 42)
        assert seen == [("k", 42)]
        assert sm.remove_callback("k", sm._callbacks["k"][0]) is True

    def test_locks(self):
        sm = PipelineStateManager()
        t1, t2 = object(), object()
        assert sm.try_set_lock("b", t1)
        assert not sm.try_set_lock("b", t2)
        assert sm.try_set_lock("b", t1)  # re-entrant for the holder
        assert sm.is_locked("b")
        assert not sm.is_locked("b", token=t1)  # fence-identity parity
        assert not sm.unlock("b", t2)
        assert sm.unlock("b", t1)
        assert not sm.is_locked("b")

    def test_release(self):
        sm = PipelineStateManager()
        sm.set_buffer("x", 1)
        sm.release_buffer("x")
        assert not sm.buffer_exists("x")

    def test_save_restore_roundtrip(self, tmp_path):
        sm = PipelineStateManager(str(tmp_path), "world", "7")
        a = RNG.uniform(0, 1, (33, 33)).astype(np.float32)
        sm.set_buffer("0_0__33__TERRAIN_HEIGHT", jnp.asarray(a))
        assert sm.save_buffer_to_disk("0_0__33__TERRAIN_HEIGHT")
        # auto-restore on first get from a fresh manager (GetBuffer parity)
        sm2 = PipelineStateManager(str(tmp_path), "world", "7")
        out = sm2.get_buffer("0_0__33__TERRAIN_HEIGHT")
        np.testing.assert_array_equal(np.asarray(out), a)

    def test_save_without_path_fails_gracefully(self):
        sm = PipelineStateManager()
        sm.set_buffer("y", jnp.zeros(3))
        assert sm.save_buffer_to_disk("y") is False


class TestSerde:
    def test_manifest_layout(self, tmp_path):
        sd = SerdeManager(str(tmp_path), "alpha", "2")
        a = RNG.normal(size=(7, 5)).astype(np.float32)
        sd.save("buf__name", a)
        root = os.path.join(str(tmp_path), "save__alpha_2")
        assert os.path.exists(os.path.join(root, "files.json"))
        assert os.path.exists(os.path.join(root, "data", "buf__name.data"))
        # fresh manager reads the manifest
        sd2 = SerdeManager(str(tmp_path), "alpha", "2")
        out = sd2.load("buf__name")
        np.testing.assert_array_equal(out, a)
        assert sd2.load("missing") is None

    def test_dtype_preserved(self, tmp_path):
        sd = SerdeManager(str(tmp_path), "b", "1")
        for dtype in (np.float32, np.int32, np.uint8, np.int64):
            arr = (RNG.uniform(0, 100, (9,)) ).astype(dtype)
            sd.save(f"d_{np.dtype(dtype).name}", arr)
            out = sd.load(f"d_{np.dtype(dtype).name}")
            assert out.dtype == dtype
            np.testing.assert_array_equal(out, arr)

    def test_corrupt_detection(self, tmp_path):
        sd = SerdeManager(str(tmp_path), "c", "1")
        sd.save("z", np.zeros(10, np.float32))
        path = sd._path_for("z")
        with open(path, "wb") as fh:
            fh.write(b"\x00" * 12)  # wrong byte count
        with pytest.raises(IOError):
            sd.load("z")


class TestAsyncCheckpoint:
    def test_save_all_async_roundtrip(self, tmp_path):
        sm = PipelineStateManager(str(tmp_path), "a", "1")
        arrays = {f"buf{i}": RNG.normal(size=(64, 64)).astype(np.float32)
                  for i in range(6)}
        for n, a in arrays.items():
            sm.set_buffer(n, jnp.asarray(a))
        sm.save_all(async_=True)  # barriered internally
        sm2 = PipelineStateManager(str(tmp_path), "a", "1")
        for n, a in arrays.items():
            np.testing.assert_array_equal(np.asarray(sm2.get_buffer(n)), a)

    def test_save_all_numeric_sequences(self, tmp_path):
        """Numeric list/tuple buffers checkpoint (converted ONCE — no
        probe-then-save double materialization); ragged/object payloads
        are skipped, not failed."""
        sm = PipelineStateManager(str(tmp_path), "s", "1")
        sm.set_buffer("lst", [1.0, 2.0, 3.0])
        sm.set_buffer("tup", (np.ones((4, 4), np.float32),
                              np.zeros((4, 4), np.float32)))
        sm.set_buffer("ragged", [np.ones(3), np.ones(5)])  # object dtype
        failures = sm.save_all(async_=False)
        assert failures == {}
        sm2 = PipelineStateManager(str(tmp_path), "s", "1")
        np.testing.assert_array_equal(
            np.asarray(sm2.get_buffer("lst")), [1.0, 2.0, 3.0])
        got = np.asarray(sm2.get_buffer("tup"))
        assert got.shape == (2, 4, 4) and got[0].sum() == 16.0
        assert sm2.get_buffer("ragged") is None  # skipped — nothing on disk
