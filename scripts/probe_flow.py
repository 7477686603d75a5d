"""TPU probe: fused single-launch flow kernel vs XLA flow_map."""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp
from noize_tpu.ops import flow as FL
from noize_tpu.ops.pallas import flow_pl as FP

RTT, REPS = 28.0, 6
rng = np.random.default_rng(3)

def chained(name, body):
    try:
        @jax.jit
        def run(key):
            def f(carry, k):
                return carry + body(k, carry), None
            tot, _ = jax.lax.scan(f, jnp.float32(0.0), jax.random.split(key, REPS))
            return tot
        t0 = time.perf_counter(); float(run(jax.random.PRNGKey(1))); cs = time.perf_counter()-t0
        t0 = time.perf_counter(); float(run(jax.random.PRNGKey(2)))
        wall = (time.perf_counter()-t0)*1e3
        ms = max(wall - RTT, wall*0.2)/REPS
        print(json.dumps({"probe": name, "ms": round(ms,3), "compile_s": round(cs,1)}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": str(e)[:160]}), flush=True)

for res in (2048, 1024):
    h = jnp.asarray(rng.uniform(0, 1, (res, res)).astype(np.float32))
    iters = 8 if res == 2048 else 5
    chained(f"flow_xla {res} it{iters}",
            lambda k, c, h=h, it=iters: FL.flow_map(h + c*1e-20 + jax.random.uniform(k, ())*1e-9, iterations=it).sum())
    for blk in (256, 128):
        chained(f"flow_fused {res} it{iters} b{blk}",
                lambda k, c, h=h, it=iters, b=blk: FP.flow_map_fused(h + c*1e-20 + jax.random.uniform(k, ())*1e-9, iterations=it, block=b).sum())
# correctness on-chip at 2048
h = jnp.asarray(rng.uniform(0, 1, (512, 512)).astype(np.float32))
a = np.asarray(FL.flow_map(h, iterations=8))
b = np.asarray(FP.flow_map_fused(h, iterations=8, block=64))
print(json.dumps({"probe": "exactness 512 it8", "bit_exact": bool(np.array_equal(a, b)),
                  "maxdiff": float(np.abs(a - b).max())}), flush=True)
