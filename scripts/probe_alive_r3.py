"""TPU probe (round 3): per-step alive counts during a flagship-shaped
descent — decides whether small-width patch prefetch (2 steps per gather
once the live set fits the fixed-cost gather budget) is worth building."""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp

from noize_tpu.erosion import particles as PART
from noize_tpu.erosion.world import WorldState
from noize_tpu.erosion.params import ErosionSettings
from noize_tpu.core.tiles import TileSetMeta
from noize_tpu.ops.fractal import fractal

res, margin = 2048, 16
meta = TileSetMeta(tile_res=res - 2 * margin, tile_size=res - 2 * margin,
                   generator_res=res, height=1000, margin=margin)
es = ErosionSettings()
params = es.as_parameters()

@jax.jit
def alive_curve(key):
    h = fractal(res, 3.0, 0.0, noise_type="Simplex", octaves=13, hurst=0.4,
                noise_size=1700.0)
    w = WorldState.create(h)
    parts = PART.spawn(key, es.PARTICLES_PER_CYCLE, res)
    wih = 1000.0 * (h + w.pool)
    all_h = wih + params.FLOW_HEIGHT_CONTRIBUTION * w.flow
    maps = jnp.concatenate([wih.reshape(-1), all_h.reshape(-1),
                            w.flow.reshape(-1)])

    def body(p, _):
        p, _ev = PART.descend_step(p, w, params, 1000.0, meta.patch_res,
                                   res, maps=maps)
        return p, jnp.sum(p.alive.astype(jnp.int32))

    _, counts = jax.lax.scan(body, parts, None, length=params.MAXAGE + 1)
    return counts

t0 = time.perf_counter()
c = np.asarray(alive_curve(jax.random.PRNGKey(0)))
print(json.dumps({"compile_plus_run_s": round(time.perf_counter() - t0, 1)}),
      flush=True)
print(json.dumps({"alive_every_4_steps": c[::4].tolist()}), flush=True)
for thr in (500, 250, 125, 64):
    idx = int(np.argmax(c <= thr)) if (c <= thr).any() else -1
    print(json.dumps({"threshold": thr, "first_step": idx}), flush=True)
