"""Batch-size scaling of the production tile pipeline (config-5 shape):
ms/tile for T in {1, 4, 16, 36, 64} batched 1024^2 noise->blur17->erode
tiles on one chip.  Locates the throughput knee that sets the recommended
TileServer batch_size (README serving guidance; reference analog is the
one-tile-per-frame queue in Scripts/MeshTileGenerator.cs:125-138).
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")

from bench import _time_chained
from noize_tpu.core.tiles import TileSetMeta
from noize_tpu.erosion.params import ErosionSettings
from noize_tpu.parallel import tiled as TL

RES = 1024
MARGIN = 16


def main():
    meta = TileSetMeta(
        tile_res=RES - 2 * MARGIN, tile_size=RES - 2 * MARGIN,
        generator_res=RES, height=1000, margin=MARGIN,
    )
    es = ErosionSettings(
        PARTICLES_PER_CYCLE=250, MAXAGE=32, WATER_STEPS=4, CYCLES=1,
        PILING_RADIUS=8,
    )
    cfg = TL.TilePipelineConfig(
        meta=meta, octaves=13, noise_size=1700.0, blur_iterations=17,
        erosion=es, erosion_cycles=1,
    )

    for side in (1, 2, 4, 6, 8):
        t = side * side
        origins = np.asarray(TL.grid_origins(meta, side, side))

        def body(k, origins=origins):
            off = jax.random.randint(k, (), 0, 1000)
            return TL.tile_batch(cfg, origins + off).sum()

        try:
            reps = 4 if t <= 16 else 2
            ms = _time_chained(body, reps=reps)
            print(f"batch {t:3d} tiles: {ms:8.2f} ms total, "
                  f"{ms / t:6.2f} ms/tile, "
                  f"{t * RES * RES / ms / 1e6:6.2f} Gcells/s", flush=True)
        except Exception as e:
            print(f"batch {t:3d} tiles: FAIL {type(e).__name__}: {e}"[:200],
                  flush=True)


if __name__ == "__main__":
    main()
