"""Which stage degrades per-tile with batch size?  probe_batch_scale
measured per-tile cost RISING with T (1.79 -> 5.30 ms/tile at T=36,
config-5 shape); this ablates noise / +blur17 / +erosion at each T so
the degradation can be attributed (and attacked) per stage.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np
from dataclasses import replace

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
    full = TL.TilePipelineConfig(
        meta=meta, octaves=13, noise_size=1700.0, blur_iterations=17,
        erosion=es, erosion_cycles=1,
    )
    variants = [
        ("noise      ", replace(full, blur_iterations=0, erosion=None,
                                erosion_cycles=0)),
        ("noise+blur ", replace(full, erosion=None, erosion_cycles=0)),
        ("full       ", full),
    ]

    for side in (1, 2, 4, 6):
        t = side * side
        origins = np.asarray(TL.grid_origins(meta, side, side))
        for name, cfg in variants:
            def body(k, origins=origins, cfg=cfg):
                off = jax.random.randint(k, (), 0, 1000)
                return TL.tile_batch(cfg, origins + off).sum()

            try:
                reps = 4 if t <= 16 else 2
                ms = _time_chained(body, reps=reps)
                print(f"T={t:3d} {name}: {ms:8.2f} ms total, "
                      f"{ms / t:6.2f} ms/tile", flush=True)
            except Exception as e:
                print(f"T={t:3d} {name}: FAIL {type(e).__name__}: {e}"[:200],
                      flush=True)


if __name__ == "__main__":
    main()
