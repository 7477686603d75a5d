"""Round-4 probe: pool pair-fused at block 256 (padless-carry form).

The two-point launch-granularity fit (BENCH_HISTORY round 4: per-phase
compute c = 0.129 ms, per-launch overhead L = 0.17 ms) predicts block
256 at ppl8 cuts the mandatory halo recompute from 25% to 12.5%:
40c x 1.125 + 5L = 6.65 ms vs the measured 7.29 at b128.  Round 3
recorded "block 256 fails the Mosaic compile" for the PADDED form; the
padless kernel has different window geometry — retry both ppl at b256,
plus ppl8/b512 (6.25% halo, 2 blocks) as the extreme point.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")

import jax.numpy as jnp

from bench import _measure_rtt
from noize_tpu.erosion import pool_pallas as PP
from noize_tpu.ops.fractal import fractal

RES = 2048


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
        w2, _, cs2 = chained(body, 2)
        w8, walls8, cs8 = chained(body, 8)
        rtt = _measure_rtt()
        print(json.dumps({
            "probe": name,
            "slope_ms_per_call": round((w8 - w2) / 6.0, 3),
            "std_method_reps8_ms": round(max(w8 - rtt, w8 * 0.2) / 8.0, 3),
            "min_wall_reps2_ms": round(w2, 1),
            "min_wall_reps8_ms": round(w8, 1),
            "walls_reps8": [round(w, 1) for w in walls8],
            "live_rtt_ms": round(rtt, 1),
            "compile_s": [round(cs2, 1), round(cs8, 1)],
        }), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name,
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)


def main():
    hb = jax.block_until_ready(jax.jit(
        lambda: fractal(RES, 0, 0, noise_type="Simplex", octaves=13,
                        hurst=0.4, noise_size=1700.0))())
    w_dense = jnp.full((RES, RES), 1e-3, jnp.float32)

    def eps(k):
        return jax.random.uniform(k, (), minval=0.0, maxval=1e-9)

    def body_with(ppl, blk):
        def body(k):
            p, d = PP.pool_automata_pallas_pair_fused(
                hb + eps(k), w_dense, iterations=10, drain_particles=True,
                block=blk, phases_per_launch=ppl, unroll=True)
            return p[0, 0] + d.sum()
        return body

    measure("padless_ppl8_b256", body_with(8, 256))
    measure("padless_ppl4_b256", body_with(4, 256))
    measure("padless_ppl8_b512", body_with(8, 512))


if __name__ == "__main__":
    main()
