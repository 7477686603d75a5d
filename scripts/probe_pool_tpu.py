"""TPU probe: pool automata kernels at 2048^2 — pair vs fused-quad variants.

Chained-scalar timing (see bench.py): scan K calls inside one jit with a
scalar output, subtract dispatch RTT, divide by K.
"""
import json, os, time
import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp

from noize_tpu.erosion import pool as P
from noize_tpu.erosion import pool_pallas as PP

RES = 2048
RTT = 28.0
REPS = 4

rng = np.random.default_rng(5)
h = jnp.asarray(rng.uniform(0, 1, (RES, RES)).astype(np.float32))
# production-shaped water: dense-ish pools in basins
w = jnp.asarray((rng.uniform(-0.1, 0.05, (RES, RES))).clip(0).astype(np.float32))

def timed(name, fn):
    import traceback
    @jax.jit
    def run(key):
        def body(carry, k):
            hh = h + carry * 1e-20  # thread dependency so scan steps serialize
            p, d = fn(hh, w)
            return carry + p[0, 0] + d[0, 0], None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), jax.random.split(key, REPS))
        return total
    t0 = time.perf_counter(); float(run(jax.random.PRNGKey(1))); compile_s = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(jax.random.PRNGKey(2)))
    wall = (time.perf_counter() - t0) * 1e3
    ms = max(wall - RTT, wall * 0.2) / REPS
    print(json.dumps({"probe": name, "ms_per_call": round(ms, 2),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return ms

def safe(name, fn):
    try:
        return timed(name, fn)
    except Exception as e:
        print(json.dumps({"probe": name, "error": str(e)[:200]}), flush=True)
        return None

results = {}
results["pair_b256"] = safe("pair x10 (block 256)", lambda hh, ww: PP.pool_automata_pallas_pair(hh, ww, iterations=10, drain_particles=True, block=256))
results["quad_ppl4_b256"] = safe("quad ppl4 block256 x10", lambda hh, ww: PP.pool_automata_pallas_quad(hh, ww, iterations=10, drain_particles=True, block=256, phases_per_launch=4))
results["quad_ppl8_b256"] = safe("quad ppl8 block256 x10", lambda hh, ww: PP.pool_automata_pallas_quad(hh, ww, iterations=10, drain_particles=True, block=256, phases_per_launch=8))
results["quad_ppl20_b256"] = safe("quad ppl20 block256 x10", lambda hh, ww: PP.pool_automata_pallas_quad(hh, ww, iterations=10, drain_particles=True, block=256, phases_per_launch=20))
print(json.dumps({"all": results}))
