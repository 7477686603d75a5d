"""TPU probe: fused kernels under vmap (the tile_batch path) + config 3/5 repro."""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp

def safe(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(json.dumps({"probe": name, "ok": True}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": str(e)[:200]}), flush=True)

from noize_tpu.ops.pallas import thermal_pl as TP, flow_pl as FP
h = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (4, 256, 256)).astype(np.float32))
safe("vmap thermal_fused", lambda: jax.vmap(
    lambda x: TP.thermal_erosion_fused(x, 45.0, 0.5, 1.0, iterations=1, block=128))(h))
safe("vmap flow_fused", lambda: jax.vmap(
    lambda x: FP.flow_map_fused(x, iterations=4, block=128))(h))

from noize_tpu.pipeline.stages import FlowMapStage
stage = FlowMapStage(iterations=5)
h3 = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1024, 1024)).astype(np.float32))
safe("config3 stage path", lambda: jax.jit(lambda x: stage.array_fn(x).sum())(h3))

from noize_tpu.parallel import tiled as TL
from noize_tpu.core.tiles import TileSetMeta
from noize_tpu.erosion.params import ErosionSettings
meta5 = TileSetMeta(tile_res=992, tile_size=992, generator_res=1024, height=1000, margin=16)
es5 = ErosionSettings(PARTICLES_PER_CYCLE=250, MAXAGE=32, WATER_STEPS=4, CYCLES=1, PILING_RADIUS=8)
cfg5 = TL.TilePipelineConfig(meta=meta5, octaves=13, noise_size=1700.0, blur_iterations=17, erosion=es5, erosion_cycles=1)
origins = TL.grid_origins(meta5, 2, 1)
safe("config5 tile_batch(2)", lambda: TL.tile_batch(cfg5, origins))
