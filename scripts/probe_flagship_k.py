"""TPU probe: flagship wall vs chain length K — fit wall = a + b*K to
separate the per-dispatch fixed overhead (a) from the true per-step
marginal cost (b)."""
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

def chained_fn(K):
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
        total, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jax.random.split(key, K))
        return total
    return chained

results = {}
for K in (2, 4, 8):
    f = chained_fn(K)
    t0 = time.perf_counter()
    float(f(jax.random.PRNGKey(1)))
    compile_s = time.perf_counter() - t0
    walls = []
    for seed in (2, 3, 4):
        t0 = time.perf_counter()
        float(f(jax.random.PRNGKey(seed)))
        walls.append((time.perf_counter() - t0) * 1e3)
    results[K] = min(walls)
    print(json.dumps({"K": K, "wall_ms": round(min(walls), 1),
                      "walls": [round(w, 1) for w in walls],
                      "compile_s": round(compile_s, 1)}), flush=True)

ks = sorted(results)
xs = np.array(ks, dtype=np.float64)
ys = np.array([results[k] for k in ks])
b, a = np.polyfit(xs, ys, 1)
print(json.dumps({"fit_fixed_ms": round(a, 2),
                  "fit_per_step_ms": round(b, 3)}), flush=True)
