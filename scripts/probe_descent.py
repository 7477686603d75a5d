"""TPU probe: descent scan — 2-map vs 3-map gather table at 2048^2."""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp
from noize_tpu.erosion import particles as PART
from noize_tpu.erosion.world import WorldState
from noize_tpu.erosion.params import ErosionSettings

RTT, REPS = 28.0, 3
RES = 2048
rng = np.random.default_rng(5)
h = jnp.asarray(rng.uniform(0, 1, (RES, RES)).astype(np.float32))
es = ErosionSettings()
params = es.as_parameters()

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
        print(json.dumps({"probe": name, "ms": round(ms,2), "compile_s": round(cs,1)}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": str(e)[:160]}), flush=True)

VARIANTS = [
    ("waf chunk8 scatter-chunk", dict()),
    ("waf chunk8 scatter-end", dict(scatter="end")),
    ("waf chunk16 scatter-chunk", dict(chunk=16)),
    ("waf chunk16 scatter-end", dict(chunk=16, scatter="end")),
]
for name, kw in VARIANTS:
    def body(k, c, kw=kw):
        parts = PART.spawn(k, es.PARTICLES_PER_CYCLE, RES)
        w = WorldState.create(h + c * 1e-20)
        _, t, p_, s = PART.descend_all(parts, w, params, 1000.0, 1.0, RES, **kw)
        return t.sum() + p_.sum() + s.sum()
    chained(f"descent 1000x101 {name}", body)
