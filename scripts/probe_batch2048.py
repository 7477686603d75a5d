"""Round-5 probe: tile_batch at flagship scale (T=2 × 2048², full
erosion + mesh) — the pool dispatch ladder under the hybrid batch
lowering; 137 ms warm for the 2-tile batch (BENCH_HISTORY round 5).
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np
from noize_tpu.core.tiles import TileSetMeta
from noize_tpu.erosion.params import ErosionSettings
from noize_tpu.parallel import tiled as TL

res = 2048
meta = TileSetMeta(tile_res=res - 32, tile_size=res - 32, generator_res=res,
                   height=1000, margin=16).validate()
es = ErosionSettings(PARTICLES_PER_CYCLE=1000, MAXAGE=100,
                     WATER_STEPS=10, CYCLES=1)
cfg = TL.TilePipelineConfig(meta=meta, octaves=13, noise_size=1700.0,
                            blur_iterations=17, erosion=es,
                            erosion_cycles=1, emit_mesh=True)
origins = np.array([[0, 0], [1, 0]], np.int32)
t0 = time.time()
out = TL.tile_batch(cfg, origins, seed=1)
h = jax.block_until_ready(out["height"])
first = time.time() - t0
t0 = time.time()
out = TL.tile_batch(cfg, origins, seed=2)
h = jax.block_until_ready(out["height"])
warm = (time.time() - t0) * 1e3
print(json.dumps({"probe": "tile_batch_2048_T2_erosion_mesh",
                  "ok": bool(np.isfinite(np.asarray(h).sum())),
                  "first_call_s": round(first, 1),
                  "warm_wall_ms": round(warm, 1)}))
