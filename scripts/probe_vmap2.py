import json
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
        print(json.dumps({"probe": name, "error": str(e)[:160]}), flush=True)

from noize_tpu.erosion import pool_pallas as PP
h = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (2, 512, 512)).astype(np.float32))
p = jnp.asarray(np.random.default_rng(2).uniform(0, 0.05, (2, 512, 512)).astype(np.float32))
safe("vmap pool_pair", lambda: jax.vmap(lambda a, b: PP.pool_automata_pallas_pair(
    a, b, iterations=2, drain_particles=True, block=128)[0])(h, p))
safe("vmap pool_pair_fused", lambda: jax.vmap(lambda a, b: PP.pool_automata_pallas_pair_fused(
    a, b, iterations=2, drain_particles=True, block=64, phases_per_launch=4, unroll=True)[0])(h, p))

from noize_tpu.erosion.sim import erosion_cycle, init_state
from noize_tpu.erosion.params import ErosionSettings
from noize_tpu.core.tiles import TileSetMeta
meta = TileSetMeta(tile_res=512, tile_size=512, generator_res=512, height=1000, margin=0)
es = ErosionSettings(PARTICLES_PER_CYCLE=64, MAXAGE=8, WATER_STEPS=2, CYCLES=1, PILING_RADIUS=8)
safe("vmap erosion_cycle 512", lambda: jax.vmap(
    lambda x: erosion_cycle(init_state(x, jax.random.PRNGKey(0)), es, meta).world.height)(h))
