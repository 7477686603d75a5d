"""TPU probe: descent alive-compaction on production-shaped terrain."""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp
import dataclasses
from noize_tpu.erosion import particles as PART
from noize_tpu.erosion.world import WorldState
from noize_tpu.erosion.params import ErosionSettings
from noize_tpu.app.flagship import make_tile_step, default_meta

REPS = 3
RES = 2048
rng = np.random.default_rng(5)
h = jnp.asarray(rng.uniform(0, 1, (RES, RES)).astype(np.float32))
pool = jnp.asarray((rng.uniform(-0.15, 0.08, (RES, RES))).clip(0).astype(np.float32))
flow = jnp.asarray(rng.uniform(0, 1, (RES, RES)).astype(np.float32))
es = ErosionSettings()
params = es.as_parameters()

_rttf = jax.jit(lambda x: x + 1.0)
float(_rttf(jnp.float32(0)))
def rtt():
    walls = []
    for i in range(5):
        t0 = time.perf_counter(); float(_rttf(jnp.float32(i)))
        walls.append((time.perf_counter()-t0)*1e3)
    return min(walls)

def chained(name, body, reps=REPS):
    try:
        @jax.jit
        def run(key):
            def f(carry, k):
                return carry + body(k, carry), None
            tot, _ = jax.lax.scan(f, jnp.float32(0.0), jax.random.split(key, reps))
            return tot
        t0 = time.perf_counter(); float(run(jax.random.PRNGKey(1))); cs = time.perf_counter()-t0
        r = rtt()
        walls = []
        for seed in (2, 3):
            t0 = time.perf_counter(); float(run(jax.random.PRNGKey(seed)))
            walls.append((time.perf_counter()-t0)*1e3)
        ms = max(min(walls) - r, min(walls)*0.2)/reps
        print(json.dumps({"probe": name, "ms": round(ms,2), "compile_s": round(cs,1)}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": str(e)[:160]}), flush=True)

for compact in (False, True):
    for terrain in ("dry", "pooled"):
        def body(k, c, compact=compact, terrain=terrain):
            w = WorldState.create(h + c * 1e-20)
            if terrain == "pooled":
                w = dataclasses.replace(w, pool=pool, flow=flow)
            parts = PART.spawn(k, es.PARTICLES_PER_CYCLE, RES)
            _, t, p_, s = PART.descend_all(parts, w, params, 1000.0, 1.0, RES,
                                           compact=compact)
            return t.sum() + p_.sum() + s.sum()
        chained(f"descent {terrain} compact={compact}", body)

# flagship end-to-end with compaction (default on)
meta = default_meta()
step, _, _ = make_tile_step(meta, es, octaves=13, blur_iterations=17,
                            flow_iterations=8, erosion_cycles=es.CYCLES,
                            emit_mesh=True)
def fbody(k, c):
    out = step(jax.random.uniform(k, (), minval=0, maxval=1000.0) + c * 1e-20,
               jax.random.uniform(jax.random.fold_in(k, 1), (), minval=0, maxval=1000.0),
               k)
    return out["height"].sum() + out["stream"].sum() + out["mesh"].positions.sum()
chained("flagship 2048 (compact descent)", fbody, reps=4)
