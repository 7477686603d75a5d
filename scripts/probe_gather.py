"""TPU probe: is the fixed gather cost table-size-dependent?

Gathers a fixed 10K elements from f32 tables of 1M..48M elements, chained.
If cost scales with table size, the descent's per-step gather can be cut
by shrinking the combo table; if flat, it's true op latency and the
descent floor stands.
Also: element-count scaling at fixed table size, and a scatter-add probe.
"""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp

RTT, REPS = 28.0, 8
rng = np.random.default_rng(7)

def chained(name, body):
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
    print(json.dumps({"probe": name, "ms": round(ms,4), "compile_s": round(cs,1)}), flush=True)

N = 10_000
for tbl_m in (1, 4, 12, 48):
    tbl = jnp.asarray(rng.uniform(0, 1, tbl_m * 1_000_000).astype(np.float32))
    def body(k, carry, tbl=tbl, size=tbl_m*1_000_000):
        idx = jax.random.randint(k, (N,), 0, size)
        # serialize on carry so scan steps don't overlap
        return jnp.take(tbl, idx + (carry * 1e-20).astype(jnp.int32)).sum()
    chained(f"gather 10K from {tbl_m}M table", body)

tbl = jnp.asarray(rng.uniform(0, 1, 12_000_000).astype(np.float32))
for n in (1_000, 10_000, 50_000, 200_000):
    def body(k, carry, n=n):
        idx = jax.random.randint(k, (n,), 0, 12_000_000)
        return jnp.take(tbl, idx + (carry * 1e-20).astype(jnp.int32)).sum()
    chained(f"gather {n} from 12M table", body)

# scatter-add probe: 8K updates into a 4M accumulator (descent chunk shape)
acc = jnp.zeros(4_194_304, jnp.float32)
for n in (8_000, 80_000):
    def body(k, carry, n=n):
        idx = jax.random.randint(k, (n,), 0, 4_194_304)
        vals = jax.random.uniform(k, (n,)) + carry * 1e-20
        return acc.at[idx].add(vals)[0]
    chained(f"scatter-add {n} into 4M", body)
