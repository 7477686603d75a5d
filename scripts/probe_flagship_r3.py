"""TPU probe (round 3): flagship chained timing after the pool-core rewrite."""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp

from noize_tpu.app.flagship import make_tile_step
from noize_tpu.core.tiles import TileSetMeta
from noize_tpu.erosion.params import ErosionSettings

res, margin = 2048, 16
meta = TileSetMeta(tile_res=res - 2 * margin, tile_size=res - 2 * margin,
                   generator_res=res, height=1000, margin=margin).validate()
settings = ErosionSettings()
step, _, _ = make_tile_step(meta, settings, octaves=13, blur_iterations=17,
                            flow_iterations=8,
                            erosion_cycles=settings.CYCLES, emit_mesh=True)

K = 4

@jax.jit
def chained(key):
    def body(carry, k):
        out = step(
            jax.random.uniform(k, (), minval=0, maxval=1000.0),
            jax.random.uniform(jax.random.fold_in(k, 1), (), minval=0,
                               maxval=1000.0),
            k,
        )
        s = out["height"].sum() + out["stream"].sum()
        if "mesh" in out:
            s = s + out["mesh"].positions.sum()
        return carry + s, None
    total, _ = jax.lax.scan(body, jnp.float32(0.0), jax.random.split(key, K))
    return total

t0 = time.perf_counter()
float(chained(jax.random.PRNGKey(1)))
print(json.dumps({"compile_plus_first_s": round(time.perf_counter() - t0, 1)}), flush=True)

_ping = jax.jit(lambda x: x + 1.0)
float(_ping(jnp.float32(0.0)))
def rtt():
    w = []
    for i in range(5):
        t0 = time.perf_counter(); float(_ping(jnp.float32(i)))
        w.append((time.perf_counter() - t0) * 1e3)
    return max(min(w), 1.0)

r = rtt()
walls = []
for seed in (2, 3, 4, 5):
    t0 = time.perf_counter()
    float(chained(jax.random.PRNGKey(seed)))
    walls.append((time.perf_counter() - t0) * 1e3)
wall = min(walls)
ms = max(wall - r, wall * 0.5) / K
print(json.dumps({"probe": "flagship_2048", "ms": round(ms, 2),
                  "rtt_ms": round(r, 1),
                  "walls": [round(w, 1) for w in walls]}), flush=True)
