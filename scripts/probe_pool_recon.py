"""Round-4 probe: reconcile pool's 7.91 ms bench entry vs the 6.28 ms
round-3 sweep reading (VERDICT r3 item 1).

All runs use the production pair-fused kernel (block=128,
phases_per_launch=4, unroll=True, iterations=10, drain_particles=True).
For each body variant the PRIMARY readout is the reps-slope
(min-wall at reps=8 minus min-wall at reps=2, divided by 6): every fixed
offset — dispatch RTT, readback, scan overhead — cancels, leaving the
true marginal per-call cost.  The standard bench method
((wall - live RTT)/reps) is printed alongside for comparison.

Factors varied one at a time from the bench entry:
  bench_exact      fractal terrain, dense 1e-3 water, p[0,0]+d.sum()
  bench_d00        ... but consumes d[0,0] instead of d.sum()
  bench_thirdwet   ... dense water -> sweep's third-wet random water
  sweep_exact      probe_pool3 body verbatim (rand terrain, third-wet,
                   d[0,0]) + its fixed RTT=28/REPS=4 arithmetic, to
                   reproduce the historical 6.28 reading
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

from bench import _measure_rtt
from noize_tpu.erosion import pool_pallas as PP
from noize_tpu.ops.fractal import fractal

RES = 2048
KW = dict(iterations=10, drain_particles=True, block=128,
          phases_per_launch=4, unroll=True)


def kernel(h, w):
    return PP.pool_automata_pallas_pair_fused(h, w, **KW)


def chained(body, reps):
    @jax.jit
    def run(key):
        def step(carry, k):
            return carry + body(k), None
        total, _ = jax.lax.scan(step, jnp.float32(0.0),
                                jax.random.split(key, reps))
        return total
    t0 = time.perf_counter()
    float(run(jax.random.PRNGKey(1)))
    compile_s = time.perf_counter() - t0
    walls = []
    for seed in (2, 3, 4):
        t0 = time.perf_counter()
        float(run(jax.random.PRNGKey(seed)))
        walls.append((time.perf_counter() - t0) * 1e3)
    return min(walls), walls, compile_s


def measure(name, body):
    try:
        w2, walls2, cs2 = chained(body, 2)
        w8, walls8, cs8 = chained(body, 8)
        rtt = _measure_rtt()
        slope = (w8 - w2) / 6.0
        std8 = max(w8 - rtt, w8 * 0.2) / 8.0
        print(json.dumps({
            "probe": name,
            "slope_ms_per_call": round(slope, 3),
            "std_method_reps8_ms": round(std8, 3),
            "min_wall_reps2_ms": round(w2, 1),
            "min_wall_reps8_ms": round(w8, 1),
            "walls_reps8": [round(w, 1) for w in walls8],
            "live_rtt_ms": round(rtt, 1),
            "compile_s": [round(cs2, 1), round(cs8, 1)],
        }), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name,
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)


def main():
    hb = jax.block_until_ready(jax.jit(
        lambda: fractal(RES, 0, 0, noise_type="Simplex", octaves=13,
                        hurst=0.4, noise_size=1700.0))())
    rng = np.random.default_rng(5)
    h_rand = jnp.asarray(rng.uniform(0, 1, (RES, RES)).astype(np.float32))
    w_third = jnp.asarray(
        rng.uniform(-0.1, 0.05, (RES, RES)).clip(0).astype(np.float32))
    w_dense = jnp.full((RES, RES), 1e-3, jnp.float32)

    def eps(k):
        return jax.random.uniform(k, (), minval=0.0, maxval=1e-9)

    def bench_exact(k):
        p, d = kernel(hb + eps(k), w_dense)
        return p[0, 0] + d.sum()

    def bench_d00(k):
        p, d = kernel(hb + eps(k), w_dense)
        return p[0, 0] + d[0, 0]

    def bench_thirdwet(k):
        p, d = kernel(hb + eps(k), w_third)
        return p[0, 0] + d.sum()

    measure("bench_exact", bench_exact)
    measure("bench_d00", bench_d00)
    measure("bench_thirdwet", bench_thirdwet)

    # sweep-exact replication: probe_pool3's body + arithmetic verbatim
    try:
        REPS, RTT_FIXED = 4, 28.0

        @jax.jit
        def run(key):
            def step(carry, k):
                hh = h_rand + carry * 1e-20
                p, d = kernel(hh, w_third)
                return carry + p[0, 0] + d[0, 0], None
            total, _ = jax.lax.scan(step, jnp.float32(0.0),
                                    jax.random.split(key, REPS))
            return total

        float(run(jax.random.PRNGKey(1)))
        t0 = time.perf_counter()
        float(run(jax.random.PRNGKey(2)))
        wall = (time.perf_counter() - t0) * 1e3
        ms = max(wall - RTT_FIXED, wall * 0.2) / REPS
        rtt = _measure_rtt()
        print(json.dumps({
            "probe": "sweep_exact_replica",
            "ms_per_call_fixed_rtt28": round(ms, 2),
            "wall_ms": round(wall, 1),
            "ms_per_call_live_rtt": round(
                max(wall - rtt, wall * 0.2) / REPS, 2),
            "live_rtt_ms": round(rtt, 1),
        }), flush=True)
    except Exception as e:
        print(json.dumps({"probe": "sweep_exact_replica",
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)


if __name__ == "__main__":
    main()
