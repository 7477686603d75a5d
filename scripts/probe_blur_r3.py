"""TPU probe (round 3): row-block fused blur chain vs XLA at several sizes,
plus on-chip bit-exactness, plus fused thermal/flow at 8192."""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp

from noize_tpu.ops import kernels as K
from noize_tpu.ops.pallas import stencil as PS

taps = jnp.asarray(K.gaussian_taps(1.0, 5))

_ping = jax.jit(lambda x: x + 1.0)
float(_ping(jnp.float32(0.0)))

def rtt():
    w = []
    for i in range(5):
        t0 = time.perf_counter(); float(_ping(jnp.float32(i)))
        w.append((time.perf_counter() - t0) * 1e3)
    return max(min(w), 1.0)

def bench(name, fn, h, reps=4):
    try:
        @jax.jit
        def run(key):
            def body(carry, k):
                return carry + fn(h + carry * 1e-20).sum(), None
            total, _ = jax.lax.scan(body, jnp.float32(0.0),
                                    jax.random.split(key, reps))
            return total
        t0 = time.perf_counter(); float(run(jax.random.PRNGKey(1)))
        cs = time.perf_counter() - t0
        r = rtt()
        walls = []
        for seed in (2, 3):
            t0 = time.perf_counter(); float(run(jax.random.PRNGKey(seed)))
            walls.append((time.perf_counter() - t0) * 1e3)
        ms = max(min(walls) - r, min(walls) * 0.2) / reps
        print(json.dumps({"probe": name, "ms": round(ms, 2),
                          "rtt": round(r, 1), "compile_s": round(cs, 1)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"probe": name,
                          "error": f"{type(e).__name__}: {e}"[:250]}),
              flush=True)

def xla_chain(h):
    def it(_, a):
        return K.separable_series(a, taps, taps, 1.0)
    return jax.lax.fori_loop(0, 17, it, h)

rng = np.random.default_rng(9)
# on-chip bit-exactness at 2048 first
h2 = jnp.asarray(rng.uniform(0, 1, (2048, 2048)).astype(np.float32))
got = np.asarray(jax.jit(lambda h: PS.gauss_chain(h, 5, 1.0, 17))(h2))
want = np.asarray(jax.jit(xla_chain)(h2))
err = float(np.abs(got - want).max())
print(json.dumps({"check": "gauss_chain vs xla 2048", "max_abs_err": err}),
      flush=True)

for res in (2048, 4096, 8192):
    h = jnp.asarray(rng.uniform(0, 1, (res, res)).astype(np.float32))
    bench(f"xla_gauss17_{res}", xla_chain, h)
    bench(f"rows_gauss17_{res}", lambda a: PS.gauss_chain(a, 5, 1.0, 17), h)

# fused thermal/flow at 8192 (config 6 pieces)
from noize_tpu.ops.pallas.thermal_pl import thermal_erosion_fused
from noize_tpu.ops.pallas.flow_pl import flow_map_fused
from noize_tpu.ops.thermal import thermal_erosion
from noize_tpu.ops import flow as FL

h8 = jnp.asarray(rng.uniform(0, 1, (8192, 8192)).astype(np.float32))
bench("thermal_fused_8192", lambda a: thermal_erosion_fused(
    a, 45.0, 0.1, 1.0, iterations=1), h8, reps=4)
bench("flow8_fused_8192", lambda a: flow_map_fused(a, iterations=8), h8,
      reps=2)
