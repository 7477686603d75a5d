"""TPU probe: fused thermal block sweep at 8192 (cap forces 128 today)."""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp
from noize_tpu.ops.pallas.thermal_pl import thermal_erosion_fused

_ping = jax.jit(lambda x: x + 1.0)
float(_ping(jnp.float32(0.0)))

def rtt():
    w = []
    for i in range(5):
        t0 = time.perf_counter(); float(_ping(jnp.float32(i)))
        w.append((time.perf_counter() - t0) * 1e3)
    return max(min(w), 1.0)

h8 = jax.block_until_ready(jax.jit(
    lambda k: jax.random.uniform(k, (8192, 8192), jnp.float32))(
        jax.random.PRNGKey(10)))

def bench(name, fn, reps=2):
    try:
        @jax.jit
        def run(key, h):
            def body(carry, k):
                return carry + fn(h + carry * 1e-20).sum(), None
            total, _ = jax.lax.scan(body, jnp.float32(0.0),
                                    jax.random.split(key, reps))
            return total
        t0 = time.perf_counter(); float(run(jax.random.PRNGKey(1), h8))
        cs = time.perf_counter() - t0
        r = rtt()
        walls = []
        for seed in (2, 3):
            t0 = time.perf_counter()
            float(run(jax.random.PRNGKey(seed), h8))
            walls.append((time.perf_counter() - t0) * 1e3)
        ms = max(min(walls) - r, min(walls) * 0.2) / reps
        print(json.dumps({"probe": name, "ms": round(ms, 2),
                          "rtt": round(r, 1), "compile_s": round(cs, 1)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"probe": name,
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)

for blk in (128, 256):
    bench(f"thermal_fused_8192_b{blk}",
          lambda a, blk=blk: thermal_erosion_fused(
              a, 45.0, 0.1, 1.0, iterations=1, block=blk))
