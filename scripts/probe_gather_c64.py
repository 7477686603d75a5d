"""TPU probe (round 3): gather cost vs element count and element dtype.

Question: is the ~0.13 ms/step descent gather fixed-cost or
element-throughput-bound at its actual size (10K elements), and does a
complex64 table (two packed f32 per element) gather at f32-like
per-element cost?  If yes, a 5×5 (wih,flow)-packed patch (25 c64 per
particle = 25K elements) can serve TWO descent steps per gather at the
same per-gather cost — halving the serial gather chain.
"""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp

RES = 2048
REPS = 64  # chain many gathers: isolates the per-gather cost
rng = np.random.default_rng(7)
table_f32 = jnp.asarray(rng.uniform(0, 1, (RES * RES,)).astype(np.float32))
table_c64 = jax.lax.complex(table_f32, table_f32 * 0.5)

_ping = jax.jit(lambda x: x + 1.0)
float(_ping(jnp.float32(0.0)))

def rtt():
    w = []
    for i in range(5):
        t0 = time.perf_counter(); float(_ping(jnp.float32(i)))
        w.append((time.perf_counter() - t0) * 1e3)
    return max(min(w), 1.0)

def bench(name, table, n_idx, extract):
    try:
        @jax.jit
        def run(key):
            def body(carry, k):
                # serial dependency: indices derive from the previous
                # gather's result, like the descent scan
                base = jax.random.randint(k, (n_idx,), 0, RES * RES)
                idx = (base + carry.astype(jnp.int32)) % (RES * RES)
                vals = jnp.take(table, idx)
                s = extract(vals)
                return s, None
            total, _ = jax.lax.scan(
                body, jnp.float32(0.0), jax.random.split(key, REPS))
            return total
        float(run(jax.random.PRNGKey(1)))
        r = rtt()
        walls = []
        for seed in (2, 3):
            t0 = time.perf_counter(); float(run(jax.random.PRNGKey(seed)))
            walls.append((time.perf_counter() - t0) * 1e3)
        wall = min(walls)
        ms = max(wall - r, wall * 0.2) / REPS
        print(json.dumps({"probe": name, "n": n_idx,
                          "us_per_gather": round(ms * 1e3, 1),
                          "rtt": round(r, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "n": n_idx,
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)

f32_sum = lambda v: v.sum()
c64_sum = lambda v: v.real.sum() + v.imag.sum()

for n in (2500, 5000, 10000, 20000, 25000, 40000, 50000, 100000):
    bench("f32", table_f32, n, f32_sum)
for n in (5000, 10000, 12500, 25000, 50000):
    bench("c64", table_c64, n, c64_sum)
