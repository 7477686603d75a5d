"""App layer tests: tile generator orchestration, bakery, visualization, CLI."""

import json
import os

import numpy as np
import pytest
import jax.numpy as jnp

from noize_tpu.app import visualize as V
from noize_tpu.app.bakery import MeshBakeOrder, MeshBakery
from noize_tpu.app.tile_generator import DemoTileGenerator, MeshTileGenerator
from noize_tpu.core.store import PipelineStateManager
from noize_tpu.core.tiles import TileSetMeta
from noize_tpu.erosion.params import ErosionSettings
from noize_tpu.pipeline import stages as S
from noize_tpu.pipeline.driver import Pipeline

RNG = np.random.default_rng(23)

SMALL_META = TileSetMeta(tile_res=24, tile_size=24, generator_res=32,
                         height=100, margin=4)
SMALL_EROSION = ErosionSettings(PARTICLES_PER_CYCLE=32, MAXAGE=6, CYCLES=1,
                                WATER_STEPS=2, PILING_RADIUS=4)


def small_source(sm=None):
    return Pipeline([
        S.NoiseStage(noiseType="Perlin", octaves=3, noiseSize=64),
        S.WriteGeneratorContextStage(contextAlias="TERRAIN_HEIGHT"),
    ], state_manager=sm)


class TestMeshTileGenerator:
    def test_enqueue_and_update(self):
        gen = MeshTileGenerator(small_source(), meta=SMALL_META,
                                erosion_settings=SMALL_EROSION)
        gen.enqueue("a", (0, 0))
        assert gen.update() is True
        assert gen.update() is False  # queue drained
        child = gen.children["(0, 0)"]
        assert child.mesh.vertex_count == (SMALL_META.tile_res + 1) ** 2
        assert child.erosion is not None
        # world-space placement (CreateChildMesh parity)
        assert child.position_ws == (-SMALL_META.margin_ws, -SMALL_META.margin_ws)

    def test_duplicate_position_rejected(self):
        gen = MeshTileGenerator(small_source(), meta=SMALL_META,
                                erosion_settings=SMALL_EROSION)
        gen.enqueue("a", (1, 1))
        gen.drain()
        with pytest.raises(ValueError):
            gen.enqueue("b", (1, 1))

    def test_remove(self):
        gen = MeshTileGenerator(small_source(), meta=SMALL_META,
                                erosion_settings=SMALL_EROSION)
        gen.enqueue("a", (0, 1))
        gen.drain()
        gen.remove((0, 1))
        with pytest.raises(KeyError):
            gen.remove((0, 1))

    def test_erosion_stepping_changes_mesh(self):
        gen = MeshTileGenerator(small_source(), meta=SMALL_META,
                                erosion_settings=SMALL_EROSION)
        gen.enqueue("a", (0, 0))
        gen.drain()
        before = np.asarray(gen.children["(0, 0)"].mesh.positions).copy()
        gen.step_erosion(cycles=2)
        after = np.asarray(gen.children["(0, 0)"].mesh.positions)
        assert np.abs(after - before).max() > 0

    def test_demo_generator_grid(self):
        gen = DemoTileGenerator(small_source(), meta=SMALL_META,
                                erosion_settings=SMALL_EROSION)
        children = gen.start(1, 1)
        assert len(children) == 4

    def test_meta_published_to_store(self):
        sm = PipelineStateManager()
        gen = MeshTileGenerator(small_source(sm), meta=SMALL_META,
                                state_manager=sm,
                                erosion_settings=SMALL_EROSION)
        assert sm.get_buffer("__G_TileSetMeta") == SMALL_META


class TestBakery:
    def _mesh(self):
        from noize_tpu.ops import mesh as M

        return M.heightmap_mesh(jnp.zeros((12, 12)), 8, 12, 10.0, 10.0)

    def test_bake_and_dedup(self):
        bak = MeshBakery(max_batch=2)
        done = []
        assert bak.enqueue(MeshBakeOrder("m1", self._mesh(), done.append))
        assert not bak.enqueue(MeshBakeOrder("m1", self._mesh()))  # dup
        assert bak.enqueue(MeshBakeOrder("m2", self._mesh(), done.append))
        n, ms = bak.service()
        assert n == 2 and done == ["m1", "m2"]
        assert isinstance(bak.known["m1"].positions, np.ndarray)
        assert not bak.enqueue(MeshBakeOrder("m1", self._mesh()))  # baked

    def test_batch_limit(self):
        bak = MeshBakery(max_batch=1)
        bak.enqueue(MeshBakeOrder("a", self._mesh()))
        bak.enqueue(MeshBakeOrder("b", self._mesh()))
        n, _ = bak.service()
        assert n == 1 and len(bak.queue) == 1
        bak.drain()
        assert len(bak.known) == 2


class TestVisualize:
    def test_byte_channel_crop_scale(self):
        src = np.zeros((8, 8), np.float32)
        src[2:6, 2:6] = 0.5
        b = np.asarray(V.to_byte_channel(jnp.asarray(src), 4, scale=1.0))
        assert b.shape == (4, 4)
        assert np.all(b == 127)
        b2 = np.asarray(V.to_byte_channel(jnp.asarray(src), 4, scale=3.0))
        assert np.all(b2 == 255)  # clamped

    def test_water_texture(self):
        pool = np.full((8, 8), 0.0005, np.float32)
        stream = np.full((8, 8), 0.25, np.float32)
        tex = V.water_control_texture(jnp.asarray(pool), jnp.asarray(stream), 8)
        assert tex.shape == (8, 8, 4)
        assert np.all(tex[..., 0] == 127)  # pool × 1000 = .5
        assert np.all(tex[..., 2] == 127)  # stream × 2 = .5

    def test_png_roundtrip_header(self, tmp_path):
        a = RNG.uniform(0, 1, (16, 16)).astype(np.float32)
        p = V.to_png(str(tmp_path / "x.png"), a)
        with open(p, "rb") as fh:
            magic = fh.read(8)
        assert magic == b"\x89PNG\r\n\x1a\n"
        rgba = np.zeros((4, 4, 4), np.uint8)
        V.to_png(str(tmp_path / "y.png"), rgba)
        assert os.path.getsize(tmp_path / "y.png") > 0

    def test_render_pipeline(self):
        out = V.render_pipeline(
            Pipeline([S.NoiseStage(octaves=2)]), 16, xpos=10, zpos=20)
        assert np.asarray(out).shape == (16, 16)

    @staticmethod
    def _decode_png16(path):
        """Minimal decoder for our own 16-bit grayscale writer (filter 0
        per row, one IDAT) — keeps the test free of imaging deps."""
        import struct
        import zlib

        with open(path, "rb") as fh:
            data = fh.read()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        w, h, depth, ctype = struct.unpack(">IIBB", data[16:26])
        assert (depth, ctype) == (16, 0)
        i, idat = 8, b""
        while i < len(data):
            (n,) = struct.unpack(">I", data[i:i + 4])
            tag = data[i + 4:i + 8]
            if tag == b"IDAT":
                idat += data[i + 8:i + 8 + n]
            i += 12 + n
        raw = zlib.decompress(idat)
        rows = []
        stride = 1 + 2 * w
        for r in range(h):
            row = raw[r * stride:(r + 1) * stride]
            assert row[0] == 0  # filter byte
            rows.append(np.frombuffer(row[1:], dtype=">u2"))
        return np.stack(rows)

    def test_png16_roundtrip(self, tmp_path):
        a = RNG.uniform(0, 1000.0, (16, 16)).astype(np.float32)
        p = V.to_png16(str(tmp_path / "h.png"), a)
        img = self._decode_png16(p)
        # min-max normalized to the full uint16 range, exact quantization
        # (in float64 like the writer — f32 arithmetic differs by 1 lsb on
        # values straddling an integer boundary)
        a64 = a.astype(np.float64)
        want = ((a64 - a64.min()) / (a64.max() - a64.min()) * 65535.0 + 0.5
                ).astype(np.uint16)
        np.testing.assert_array_equal(img.astype(np.uint16), want)

    def test_raw16_unity_layout(self, tmp_path):
        a = np.linspace(0, 1, 16, dtype=np.float32).reshape(4, 4)
        p = V.to_raw16(str(tmp_path / "h.raw"), a, scale=1.0)
        img = np.fromfile(p, dtype="<u2").reshape(4, 4)
        want = (a * 65535.0 + 0.5).astype(np.uint16)[::-1]  # bottom row first
        np.testing.assert_array_equal(img, want)
        assert os.path.getsize(p) == 4 * 4 * 2  # bare samples, no header


class TestCli:
    def test_demo_command(self, tmp_path):
        from noize_tpu.app.cli import main

        main(["demo", "-o", str(tmp_path), "--resolution", "32"])
        assert os.path.exists(tmp_path / "demo.png")
        assert np.load(tmp_path / "demo.npy").shape == (32, 32)

    def test_run_config(self, tmp_path):
        from noize_tpu.app.cli import main

        cfg = {
            "name": "t", "resolution": 16,
            "stages": [
                {"stage": "NoiseStage", "noiseType": "Cellular", "octaves": 2},
                {"stage": "ConstantStage", "operation": "BINARIZE", "value": 0.4},
            ],
        }
        cfile = tmp_path / "cfg.json"
        cfile.write_text(json.dumps(cfg))
        main(["run", str(cfile), "-o", str(tmp_path)])
        arr = np.load(tmp_path / "t.npy")
        assert set(np.unique(arr)) <= {0.0, 1.0}

    def test_unknown_stage_errors(self, tmp_path):
        from noize_tpu.app.cli import build_pipeline

        with pytest.raises(SystemExit):
            build_pipeline({"stages": [{"stage": "Nope"}]})

    def test_load_heightmap(self, tmp_path):
        """--input loader: npy/npz, min-max normalization, center-crop of
        non-square inputs, dimensionality check."""
        from noize_tpu.app.cli import _load_heightmap

        rng = np.random.default_rng(2)
        a = rng.uniform(100, 900, (20, 26)).astype(np.float32)
        p = tmp_path / "dem.npy"
        np.save(p, a)
        got = _load_heightmap(str(p))
        assert got.shape == (20, 20)
        assert got.min() == 0.0 and got.max() == 1.0
        # center crop: columns 3..23 of the original
        want = a[:, 3:23]
        want = (want - want.min()) / (want.max() - want.min())
        np.testing.assert_allclose(got, want, atol=1e-6)

        pz = tmp_path / "dem.npz"
        np.savez(pz, height=a)
        assert _load_heightmap(str(pz)).shape == (20, 20)

        bad = tmp_path / "bad.npy"
        np.save(bad, np.zeros((3, 3, 3), np.float32))
        with pytest.raises(SystemExit):
            _load_heightmap(str(bad))

    def test_load_heightmap_raw16_roundtrip(self, tmp_path):
        """to_raw16 → --input loader round-trips orientation and values
        (Unity RAW16 is bottom-row-first; both sides flip)."""
        from noize_tpu.app.cli import _load_heightmap

        rng = np.random.default_rng(4)
        a = rng.uniform(0, 1, (16, 16)).astype(np.float32)
        p = tmp_path / "terrain.raw"
        V.to_raw16(str(p), a, scale=1.0)
        got = _load_heightmap(str(p))
        # quantized to uint16 then min-max renormalized: ±1 lsb of u16
        np.testing.assert_allclose(got, (a - a.min()) / (a.max() - a.min()),
                                    atol=2.0 / 65535)

        trunc = tmp_path / "bad.raw"
        trunc.write_bytes(b"\x00" * 10)  # 5 samples, not square
        with pytest.raises(SystemExit):
            _load_heightmap(str(trunc))


class TestDrawers:
    def test_stream_drawer(self, tmp_path):
        from noize_tpu.app.drawers import StreamDrawer
        from noize_tpu.erosion.sim import ErosionSim

        res = SMALL_META.generator_res
        h = RNG.uniform(0, 1, (res, res)).astype(np.float32)
        sim = ErosionSim(h, settings=SMALL_EROSION, meta=SMALL_META)
        sim.step(1)
        sd = StreamDrawer(sim, SMALL_META)
        water, terrain = sd.refresh()
        assert water.shape == (SMALL_META.tile_res, SMALL_META.tile_res, 4)
        paths = sd.export(str(tmp_path))
        assert all(os.path.exists(p) for p in paths)

    def test_tile_drawer_from_checkpoint(self, tmp_path):
        from noize_tpu.app.drawers import TileDrawer
        from noize_tpu.erosion.sim import ErosionSim

        sm = PipelineStateManager(str(tmp_path / "saves"), "d", "1")
        res = SMALL_META.generator_res
        h = RNG.uniform(0, 1, (res, res)).astype(np.float32)
        sim = ErosionSim(h, settings=SMALL_EROSION, meta=SMALL_META,
                         state_manager=sm, tile_pos=(1, 2))
        sim.step(1)
        sim.save_erosion_state()
        # fresh manager → drawer renders from disk without a sim
        sm2 = PipelineStateManager(str(tmp_path / "saves"), "d", "1")
        td = TileDrawer(sm2, SMALL_META, tile_pos=(1, 2))
        paths = td.draw(str(tmp_path / "out"))
        assert len(paths) == 2 and all(os.path.exists(p) for p in paths)

    def test_tile_drawer_missing(self, tmp_path):
        from noize_tpu.app.drawers import TileDrawer

        td = TileDrawer(PipelineStateManager(), SMALL_META, (9, 9))
        with pytest.raises(FileNotFoundError):
            td.draw(str(tmp_path))


class TestPresets:
    def test_all_presets_run(self):
        from noize_tpu.app import presets
        from noize_tpu.core.stageio import GeneratorData

        for name in ("PerlinGenerator", "FlowMap", "Sobel"):
            pd = presets.ALL[name]
            out = Pipeline(list(pd.stages)).run(
                GeneratorData(uuid=name, resolution=32,
                              data=jnp.zeros((32, 32), jnp.float32)))
            arr = np.asarray(out.data)
            assert arr.shape == (32, 32) and np.all(np.isfinite(arr)), name


class TestTileServer:
    def test_batched_serving(self):
        from noize_tpu.app.server import TileServer
        from noize_tpu.parallel import tiled as TL

        cfg = TL.TilePipelineConfig(
            meta=SMALL_META, noise_type="Perlin", octaves=2, noise_size=64.0,
            blur_iterations=1,
        )
        srv = TileServer(cfg, batch_size=4, max_wait_ms=50.0).start()
        done = []
        for i in range(6):
            srv.submit(f"t{i}", (i, 0), on_complete=done.append)
        assert srv.drain(timeout=120)
        import time as _t
        _t.sleep(0.2)
        srv.stop()
        assert len(done) == 6
        assert srv.batches >= 2  # 6 requests / batch 4
        res = SMALL_META.generator_res
        for st in done:
            assert np.asarray(st.heights).shape == (res, res)
        # seamlessness across batch boundaries: adjacent tiles agree
        by_id = {st.request.uuid: np.asarray(st.heights) for st in done}
        m = SMALL_META
        overlap = m.generator_res - m.tile_res  # 8
        # the blur's clamped borders perturb a taps-wide band at each
        # tile's edge — the margin exists precisely so the interior of the
        # overlap agrees; compare away from both borders
        b = 3
        np.testing.assert_allclose(
            by_id["t0"][b:-b, m.tile_res + b:-b],
            by_id["t1"][b:-b, b:overlap - b], atol=1e-5)

    def test_serves_mesh_planes(self):
        """emit_mesh configs deliver per-tile vertex planes alongside
        heights (and plain configs deliver mesh_planes=None)."""
        from noize_tpu.app.server import TileServer
        from noize_tpu.parallel import tiled as TL

        cfg = TL.TilePipelineConfig(
            meta=SMALL_META, noise_type="Perlin", octaves=2, noise_size=64.0,
            blur_iterations=1, emit_mesh=True,
        )
        srv = TileServer(cfg, batch_size=2, max_wait_ms=50.0).start()
        done = []
        for i in range(2):
            srv.submit(f"t{i}", (i, 0), on_complete=done.append)
        assert srv.drain(timeout=120)
        srv.stop()
        assert len(done) == 2 and not srv.errors
        tr = SMALL_META.tile_res
        for st in done:
            assert st.error is None
            assert np.asarray(st.heights).shape == (
                SMALL_META.generator_res,) * 2
            assert np.asarray(st.mesh_planes).shape == (12, tr + 1, tr + 1)
            assert np.isfinite(np.asarray(st.mesh_planes)).all()


class TestFlagship:
    def test_tile_step_small(self):
        from noize_tpu.app.flagship import make_tile_step
        import jax

        meta = TileSetMeta(tile_res=24, tile_size=24, generator_res=32,
                           height=500, margin=4)
        step, _, _ = make_tile_step(
            meta, SMALL_EROSION, octaves=4, blur_iterations=2,
            flow_iterations=2, erosion_cycles=1,
        )
        out = step(np.float32(0), np.float32(0), jax.random.PRNGKey(0))
        assert np.asarray(out["height"]).shape == (32, 32)
        assert np.isfinite(np.asarray(out["flow_velocity"])).all()
        assert out["mesh"].vertex_count == 25 ** 2
