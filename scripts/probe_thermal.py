"""TPU probe: fused thermal kernel vs XLA path — speed and exactness."""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp
from noize_tpu.ops import thermal as T
from noize_tpu.ops.pallas import thermal_pl as TP

REPS = 8
rng = np.random.default_rng(3)
_rttf = jax.jit(lambda x: x + 1.0); float(_rttf(jnp.float32(0)))
def rtt():
    w = []
    for i in range(5):
        t0 = time.perf_counter(); float(_rttf(jnp.float32(i)))
        w.append((time.perf_counter()-t0)*1e3)
    return min(w)

def chained(name, body):
    try:
        @jax.jit
        def run(key):
            def f(c, k):
                return c + body(k, c), None
            t, _ = jax.lax.scan(f, jnp.float32(0.0), jax.random.split(key, REPS))
            return t
        t0 = time.perf_counter(); float(run(jax.random.PRNGKey(1))); cs = time.perf_counter()-t0
        r = rtt(); walls = []
        for s in (2, 3):
            t0 = time.perf_counter(); float(run(jax.random.PRNGKey(s)))
            walls.append((time.perf_counter()-t0)*1e3)
        print(json.dumps({"probe": name, "ms": round(max(min(walls)-r, min(walls)*0.2)/REPS, 3),
                          "compile_s": round(cs, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": str(e)[:160]}), flush=True)

h = jnp.asarray(rng.uniform(0, 1, (2048, 2048)).astype(np.float32))
chained("thermal_xla 2048 it1", lambda k, c: T.thermal_erosion(h + c*1e-20 + jax.random.uniform(k, ())*1e-9, 45.0, 0.5, 1.0, iterations=1).sum())
for blk, unroll in ((256, True), (128, True), (256, False)):
    chained(f"thermal_fused 2048 it1 b{blk} u{unroll}",
            lambda k, c, b=blk, u=unroll: TP.thermal_erosion_fused(h + c*1e-20 + jax.random.uniform(k, ())*1e-9, 45.0, 0.5, 1.0, iterations=1, block=b, unroll=u).sum())
# on-chip exactness
hs = jnp.asarray(rng.uniform(0, 1, (512, 512)).astype(np.float32))
a = np.asarray(T.thermal_erosion(hs, 45.0, 0.5, 1.0, iterations=2))
b = np.asarray(TP.thermal_erosion_fused(hs, 45.0, 0.5, 1.0, iterations=2, block=64, unroll=True))
print(json.dumps({"probe": "exactness 512 it2", "bit_exact": bool(np.array_equal(a, b)),
                  "maxdiff": float(np.abs(a - b).max())}), flush=True)
