"""TPU probe (round 3b): chunked rows blur + fused thermal/flow at 8192
(inputs passed as real args — a closed-over concrete array bakes a 268 MB
constant into the program and the remote compile rejects the body)."""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp

from noize_tpu.ops import kernels as K
from noize_tpu.ops.pallas import stencil as PS
from noize_tpu.ops.pallas.thermal_pl import thermal_erosion_fused
from noize_tpu.ops.pallas.flow_pl import flow_map_fused
from noize_tpu.ops import flow as FL
from noize_tpu.ops.thermal import thermal_erosion

taps = jnp.asarray(K.gaussian_taps(1.0, 5))
_ping = jax.jit(lambda x: x + 1.0)
float(_ping(jnp.float32(0.0)))

def rtt():
    w = []
    for i in range(5):
        t0 = time.perf_counter(); float(_ping(jnp.float32(i)))
        w.append((time.perf_counter() - t0) * 1e3)
    return max(min(w), 1.0)

def bench(name, fn, h, reps=2):
    try:
        @jax.jit
        def run(key, h):
            def body(carry, k):
                return carry + fn(h + carry * 1e-20).sum(), None
            total, _ = jax.lax.scan(body, jnp.float32(0.0),
                                    jax.random.split(key, reps))
            return total
        t0 = time.perf_counter(); float(run(jax.random.PRNGKey(1), h))
        cs = time.perf_counter() - t0
        r = rtt()
        walls = []
        for seed in (2, 3):
            t0 = time.perf_counter()
            float(run(jax.random.PRNGKey(seed), h))
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

def dev_field(res, seed):
    # generate ON DEVICE: uploading a 268 MB host array through the
    # ~8 MB/s tunnel takes half an hour
    return jax.block_until_ready(jax.jit(
        lambda k: jax.random.uniform(k, (res, res), jnp.float32))(
            jax.random.PRNGKey(seed)))

h4 = dev_field(4096, 9)
bench("rows_gauss17_ipl6_4096", lambda a: PS.gauss_chain(a, 5, 1.0, 17), h4)

h8 = dev_field(8192, 10)
bench("xla_gauss17_8192", xla_chain, h8)
bench("rows_gauss17_ipl6_8192", lambda a: PS.gauss_chain(a, 5, 1.0, 17), h8)
bench("thermal_fused_8192", lambda a: thermal_erosion_fused(
    a, 45.0, 0.1, 1.0, iterations=1), h8)
bench("thermal_xla_8192", lambda a: thermal_erosion(
    a, 45.0, 0.1, 1.0, iterations=1), h8)
bench("flow8_fused_8192", lambda a: flow_map_fused(a, iterations=8), h8)
