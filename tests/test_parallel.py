"""Multi-device tests on the virtual 8-device CPU mesh: halo-exchange
stencils must equal their single-device counterparts exactly; tile batches
must agree at seams."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from noize_tpu.parallel import device_mesh as DM
from noize_tpu.parallel import sharded_ops as SO
from noize_tpu.parallel import tiled as TL
from noize_tpu.ops import kernels as K
from noize_tpu.ops import blur as B
from noize_tpu.ops import flow as FL
from noize_tpu.ops import fractal as FR
from noize_tpu.core.tiles import TileSetMeta

RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests require the 8-device CPU mesh"
    return DM.spatial_mesh()


def sharded_field(mesh, res=64):
    a = RNG.uniform(0, 1, (res, res)).astype(np.float32)
    return a, jax.device_put(jnp.asarray(a), DM.field_sharding(mesh))


class TestMesh:
    def test_split(self):
        assert DM._split2(8) == (4, 2)
        assert DM._split2(4) == (2, 2)
        assert DM._split2(1) == (1, 1)

    def test_spatial_mesh_axes(self, mesh):
        assert mesh.shape["x"] * mesh.shape["y"] == 8


class TestShardedStencils:
    def test_gauss_matches_local(self, mesh):
        a, ash = sharded_field(mesh)
        got = np.asarray(SO.sharded_gauss_blur(mesh, ash, 5, 1.0, iterations=3))
        want = np.asarray(B.gauss_blur(B.gauss_blur(B.gauss_blur(
            jnp.asarray(a), 5, 1.0), 5, 1.0), 5, 1.0))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_kernel_filter_matches_local(self, mesh):
        a, ash = sharded_field(mesh)
        got = np.asarray(SO.sharded_kernel_filter(mesh, ash, "Smooth3", 2))
        want = np.asarray(K.kernel_filter(jnp.asarray(a), "Smooth3", 2))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_sobel2d_matches_local(self, mesh):
        a, ash = sharded_field(mesh)
        got = np.asarray(SO.sharded_kernel_filter(mesh, ash, "Sobel3_2D"))
        want = np.asarray(K.sobel2d(jnp.asarray(a)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_flow_map_matches_local(self, mesh):
        a, ash = sharded_field(mesh, 32)
        got = np.asarray(SO.sharded_flow_map(mesh, ash, iterations=6))
        want = np.asarray(FL.flow_map(jnp.asarray(a), iterations=6))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_fractal_matches_local(self, mesh):
        got = np.asarray(SO.sharded_fractal(
            mesh, 64, 128.0, 256.0,
            noise_type="Simplex", octaves=5, hurst=0.4, noise_size=170.0,
        ))
        want = np.asarray(FR.fractal(
            64, 128, 256,
            noise_type="Simplex", octaves=5, hurst=0.4, noise_size=170.0,
        ))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestTileBatch:
    def test_batch_matches_single(self):
        meta = TileSetMeta(tile_res=24, tile_size=24, generator_res=32,
                           height=100, margin=2)
        cfg = TL.TilePipelineConfig(
            meta=meta, noise_type="Perlin", octaves=3, noise_size=100.0,
            blur_iterations=2, blur_width=5,
        )
        origins = TL.grid_origins(meta, 2, 2)
        batched = np.asarray(TL.tile_batch(cfg, origins))
        single = np.asarray(jax.jit(
            lambda: TL.generate_tile(cfg, float(origins[3, 0]),
                                     float(origins[3, 1]),
                                     jax.random.PRNGKey(0))
        )())
        np.testing.assert_allclose(batched[3], single, atol=1e-6)

    def test_sharded_batch(self):
        bmesh = DM.batch_mesh()
        meta = TileSetMeta(tile_res=16, tile_size=16, generator_res=16,
                           height=100, margin=0)
        cfg = TL.TilePipelineConfig(
            meta=meta, noise_type="Perlin", octaves=2, noise_size=50.0,
            blur_iterations=1,
        )
        origins = TL.grid_origins(meta, 4, 2)  # 8 tiles over 8 devices
        out = TL.tile_batch(cfg, origins, mesh=bmesh)
        assert out.shape == (8, 16, 16)
        got = np.asarray(out)
        want = np.asarray(TL.tile_batch(cfg, origins))  # unsharded
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_tiles_seamless_with_margin(self):
        """Adjacent tiles generated independently agree on their overlap —
        the reference's margin-consistency contract."""
        meta = TileSetMeta(tile_res=32, tile_size=32, generator_res=40,
                           height=100, margin=4)
        cfg = TL.TilePipelineConfig(
            meta=meta, noise_type="Simplex", octaves=4, noise_size=90.0,
            blur_iterations=0,
        )
        origins = np.asarray([[0, 0], [32, 0]], np.int32)
        tiles = np.asarray(TL.tile_batch(cfg, origins))
        # tile B's window starts 32 cells right of tile A's: overlap is 8
        np.testing.assert_allclose(
            tiles[0][:, 32:], tiles[1][:, :8], atol=1e-6
        )


class TestShardedThermal:
    def test_masked_phase_matches_sliced(self):
        from noize_tpu.ops import thermal as T
        import jax.numpy as jnp

        res = 20
        a = RNG.uniform(0, 2, (res, res)).astype(np.float32)
        for (x0, z0) in T._PHASE_OFFSETS:
            want = np.asarray(T._phase(jnp.asarray(a), x0, z0, 0.01, 0.5))
            got = np.asarray(T.thermal_phase_masked(
                jnp.asarray(a), x0, z0, 0, 0, res, 0.01, 0.5))
            np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f"{x0},{z0}")

    def test_sharded_matches_local(self, mesh):
        from noize_tpu.ops import thermal as T
        from noize_tpu.parallel import sharded_ops as SO2
        import jax.numpy as jnp

        a, ash = sharded_field(mesh, 32)
        got = np.asarray(SO2.sharded_thermal_erosion(mesh, ash, 45.0, 0.5, 1.0,
                                                     iterations=2))
        want = np.asarray(T.thermal_erosion(jnp.asarray(a), 45.0, 0.5, 1.0,
                                            iterations=2))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestShardedStencilLifter:
    def test_generic_stencil_matches_local(self, mesh):
        from noize_tpu.parallel.halo import sharded_stencil
        from noize_tpu.ops import kernels as K2
        import jax.numpy as jnp

        taps = K2.gaussian_taps(2.0, 9)
        fn = sharded_stencil(
            lambda ext: K2.separable_series(ext, taps, taps, 1.0),
            halo=4, mesh=mesh,
        )
        a, ash = sharded_field(mesh, 64)
        got = np.asarray(fn(ash))
        want = np.asarray(K2.separable_series(jnp.asarray(a), taps, taps, 1.0))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestTileDeterminism:
    def test_tile_pure_function_of_origin_and_seed(self):
        """The same tile re-requested in a DIFFERENT batch (different slot,
        different companions) reproduces bit-identically — per-tile PRNG
        keys derive from world position, not batch index (ADVICE r1)."""
        from noize_tpu.erosion.params import ErosionSettings

        meta = TileSetMeta(tile_res=24, tile_size=24, generator_res=32,
                           height=100, margin=4)
        cfg = TL.TilePipelineConfig(
            meta=meta, noise_type="Perlin", octaves=3, noise_size=100.0,
            blur_iterations=1, blur_width=5,
            erosion=ErosionSettings(PARTICLES_PER_CYCLE=16, MAXAGE=4,
                                    WATER_STEPS=2, CYCLES=1,
                                    PILING_RADIUS=4),
            erosion_cycles=1,
        )
        origins = TL.grid_origins(meta, 2, 2)
        a = np.asarray(TL.tile_batch(cfg, origins, seed=7))
        # tile 3 moved to slot 0, batch now holds different companions
        reordered = np.concatenate([origins[3:4], origins[1:3]])
        b = np.asarray(TL.tile_batch(cfg, reordered, seed=7))
        np.testing.assert_array_equal(a[3], b[0])
        # different seed still changes the content
        c = np.asarray(TL.tile_batch(cfg, reordered, seed=8))
        assert not np.array_equal(b[0], c[0])

    def test_negative_origins(self):
        meta = TileSetMeta(tile_res=16, tile_size=16, generator_res=16,
                           height=100, margin=0)
        cfg = TL.TilePipelineConfig(
            meta=meta, noise_type="Perlin", octaves=2, noise_size=50.0,
            blur_iterations=1,
        )
        neg = np.asarray([[-32, -16], [16, -48]], np.int32)
        out = np.asarray(TL.tile_batch(cfg, neg, seed=3))
        assert np.isfinite(out).all()
