"""TPU probe: interactive erosion-cycle latency at the reference tile scale."""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp
from noize_tpu.erosion.sim import erosion_cycle, init_state
from noize_tpu.erosion.params import ErosionSettings
from noize_tpu.core.tiles import TileSetMeta
from noize_tpu.ops.fractal import fractal

REPS = 6
_rttf = jax.jit(lambda x: x + 1.0); float(_rttf(jnp.float32(0)))
def rtt():
    w = []
    for i in range(5):
        t0 = time.perf_counter(); float(_rttf(jnp.float32(i)))
        w.append((time.perf_counter()-t0)*1e3)
    return min(w)

for res in (1024, 2048):
    meta = TileSetMeta(tile_res=res-32, tile_size=res-32, generator_res=res,
                       height=1000, margin=16)
    es = ErosionSettings()
    h = jax.block_until_ready(jax.jit(lambda: fractal(
        res, 0, 0, noise_type="Simplex", octaves=13, hurst=0.4,
        noise_size=1700.0))())

    @jax.jit
    def run(key):
        def body(carry, k):
            st = init_state(h + carry * 1e-20, k)
            out = erosion_cycle(st, es, meta)
            return carry + out.world.height.sum() + out.world.pool.sum(), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), jax.random.split(key, REPS))
        return tot

    t0 = time.perf_counter(); float(run(jax.random.PRNGKey(1))); cs = time.perf_counter()-t0
    r = rtt(); walls = []
    for s in (2, 3):
        t0 = time.perf_counter(); float(run(jax.random.PRNGKey(s)))
        walls.append((time.perf_counter()-t0)*1e3)
    ms = max(min(walls)-r, min(walls)*0.2)/REPS
    print(json.dumps({"probe": f"erosion_cycle {res}", "ms": round(ms, 2),
                      "compile_s": round(cs, 1)}), flush=True)
