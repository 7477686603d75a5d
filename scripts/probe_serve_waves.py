"""Round-5 probe: TileServer waves on the real TPU — first batch pays
trace + compile/load; waves 1-2 are the steady serving number
(BENCH_HISTORY round 5: 204/174 ms per 4-tile batch incl. erosion+mesh).
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import os
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
from noize_tpu.app.server import TileServer
from noize_tpu.core.tiles import TileSetMeta
from noize_tpu.erosion.params import ErosionSettings
from noize_tpu.parallel import tiled as TL

meta = TileSetMeta(tile_res=192, tile_size=192, generator_res=256,
                   height=1000, margin=32).validate()
es = ErosionSettings(PARTICLES_PER_CYCLE=300, MAXAGE=32,
                     WATER_STEPS=4, CYCLES=1, PILING_RADIUS=8)
cfg = TL.TilePipelineConfig(meta=meta, octaves=8, noise_size=900.0,
                            blur_iterations=5, erosion=es,
                            erosion_cycles=1, emit_mesh=True)
srv = TileServer(cfg, batch_size=4, max_wait_ms=20.0).start()
for wave in range(3):
    done = []
    t0 = time.perf_counter()
    for x in range(4):
        srv.submit(f"w{wave}_{x}", (x, wave), on_complete=done.append)
    assert srv.drain(timeout=600)
    dt = (time.perf_counter() - t0) * 1e3
    print(json.dumps({"wave": wave, "tiles": len(done),
                      "wall_ms": round(dt, 1),
                      "ms_per_tile": round(dt / len(done), 2),
                      "batches_total": srv.batches}), flush=True)
srv.stop()
