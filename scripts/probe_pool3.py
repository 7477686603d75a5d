"""TPU probe #3: pair-fused pool kernel variants."""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp
from noize_tpu.erosion import pool_pallas as PP

RES, RTT, REPS = 2048, 28.0, 4
rng = np.random.default_rng(5)
h = jnp.asarray(rng.uniform(0, 1, (RES, RES)).astype(np.float32))
w = jnp.asarray((rng.uniform(-0.1, 0.05, (RES, RES))).clip(0).astype(np.float32))

def safe(name, fn):
    try:
        @jax.jit
        def run(key):
            def body(carry, k):
                hh = h + carry * 1e-20
                p, d = fn(hh, w)
                return carry + p[0, 0] + d[0, 0], None
            total, _ = jax.lax.scan(body, jnp.float32(0.0), jax.random.split(key, REPS))
            return total
        t0 = time.perf_counter(); float(run(jax.random.PRNGKey(1))); cs = time.perf_counter() - t0
        t0 = time.perf_counter(); float(run(jax.random.PRNGKey(2)))
        wall = (time.perf_counter() - t0) * 1e3
        ms = max(wall - RTT, wall * 0.2) / REPS
        print(json.dumps({"probe": name, "ms_per_call": round(ms, 2), "compile_s": round(cs, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": str(e)[:200]}), flush=True)

for name, kw in [
    ("pair_fused ppl4 unroll b256", dict(block=256, phases_per_launch=4, unroll=True)),
    ("pair_fused ppl4 switch b256", dict(block=256, phases_per_launch=4, unroll=False)),
    ("pair_fused ppl2 unroll b256", dict(block=256, phases_per_launch=2, unroll=True)),
    ("pair_fused ppl4 unroll b128", dict(block=128, phases_per_launch=4, unroll=True)),
]:
    safe(name, lambda hh, ww, kw=kw: PP.pool_automata_pallas_pair_fused(hh, ww, iterations=10, drain_particles=True, **kw))
