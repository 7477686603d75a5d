"""Round-5 probe: 4096² end-to-end erosion smoke (dry cycle + forced-wet
cycle so the mega-b128 pool runs in production context) — ~165 ms wall
for both cycles incl. one dispatch RTT (BENCH_HISTORY round 5).
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np
from noize_tpu.core.tiles import TileSetMeta
from noize_tpu.erosion.params import ErosionSettings
from noize_tpu.erosion.sim import init_state, erosion_cycle
from noize_tpu.ops.fractal import fractal

res = 4096
meta = TileSetMeta(tile_res=res - 32, tile_size=res - 32, generator_res=res,
                   height=1000, margin=16).validate()
es = ErosionSettings()
hb = jax.block_until_ready(jax.jit(
    lambda: fractal(res, 0, 0, noise_type="Simplex", octaves=13,
                    hurst=0.4, noise_size=1700.0))())

@jax.jit
def cycle2(key):
    st = init_state(hb, key)
    st = erosion_cycle(st, es, meta)
    # force a WET second cycle so the 4096 mega-b128 pool runs in context
    from dataclasses import replace
    st = replace(st, world=replace(st.world,
                                   pool=jnp.full_like(st.world.pool, 1e-3)))
    st = erosion_cycle(st, es, meta)
    return (st.world.height.sum() + st.world.pool.sum()
            + st.world.flow.sum())

t0 = time.time()
v = float(cycle2(jax.random.PRNGKey(7)))
compile_s = time.time() - t0
walls = []
for s in (8, 9):
    t0 = time.time()
    float(cycle2(jax.random.PRNGKey(s)))
    walls.append((time.time() - t0) * 1e3)
print(json.dumps({"probe": "erosion_cycle2_wet_4096", "ok": bool(np.isfinite(v)),
                  "scalar": v, "first_call_s": round(compile_s, 1),
                  "walls_ms": [round(w, 1) for w in walls]}))
