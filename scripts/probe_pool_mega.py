"""Round-4 probe: the single-launch MEGA pool kernel on the real TPU.

pool_automata_pallas_mega runs the whole x10-iterations automata (40
phases) as ONE pallas launch, grid=(n_groups, nblk) with ping-pong HBM
carry slots — vs the production pair-fused kernel's n_groups separate
launches (each re-paying launch + input-DMA warmup).  The launch-
granularity fit (BENCH_HISTORY r4) put L=0.17 ms/launch, so collapsing
10 launches (ppl4) to 1 is worth ~1.5 ms/call IF the cross-group
write-back ordering doesn't serialize the pipeline.

Readouts (bench-exact body: fractal terrain, dense 1e-3 water,
p[0,0]+d.sum(), 10 iterations), slope method ((w8-w2)/6):
  prod_pair_b256_ppl4   production baseline, same session
  mega_b256_ppl4        same phase partition, one launch
  mega_b128_ppl8        fewer groups (5), narrower block
  mega_b256_ppl8        widest (pair-fused ppl8/b256 failed Mosaic;
                        the mega geometry differs — try it)
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")

import jax.numpy as jnp

from bench import _measure_rtt, _time_slope
from noize_tpu.erosion import pool_pallas as PP
from noize_tpu.ops.fractal import fractal

RES = 2048


def measure(name, body):
    try:
        r = _time_slope(body, reps_list=(2, 8), n_walls=3)
        w8 = r["min_walls_ms"]["8"]
        rtt = _measure_rtt()
        print(json.dumps({
            "probe": name,
            "slope_ms_per_call": r["slope_8_2"],
            "std_method_reps8_ms": round(max(w8 - rtt, w8 * 0.2) / 8.0, 3),
            "live_rtt_ms": round(rtt, 1),
            **r,
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

    def pair_body(blk, ppl):
        def body(k):
            p, d = PP.pool_automata_pallas_pair_fused(
                hb + eps(k), w_dense, iterations=10, drain_particles=True,
                block=blk, phases_per_launch=ppl, unroll=True)
            return p[0, 0] + d.sum()
        return body

    def mega_body(blk, ppl):
        def body(k):
            p, d = PP.pool_automata_pallas_mega(
                hb + eps(k), w_dense, iterations=10, drain_particles=True,
                block=blk, phases_per_launch=ppl)
            return p[0, 0] + d.sum()
        return body

    # correctness gate first: one uncompiled-comparison run vs production
    p0, d0 = jax.block_until_ready(PP.pool_automata_pallas_pair_fused(
        hb, w_dense, iterations=10, drain_particles=True,
        block=256, phases_per_launch=4, unroll=True))
    try:
        p1, d1 = jax.block_until_ready(PP.pool_automata_pallas_mega(
            hb, w_dense, iterations=10, drain_particles=True,
            block=256, phases_per_launch=4))
        bit_equal = bool(jnp.array_equal(p0, p1) & jnp.array_equal(d0, d1))
        md = float(jnp.abs(p0 - p1).max())
        print(json.dumps({"probe": "mega_bitexact_vs_prod_onchip",
                          "bit_equal": bit_equal, "max_abs_diff": md}),
              flush=True)
    except Exception as e:
        print(json.dumps({"probe": "mega_bitexact_vs_prod_onchip",
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)

    measure("prod_pair_b256_ppl4", pair_body(256, 4))
    measure("mega_b256_ppl4", mega_body(256, 4))
    measure("mega_b128_ppl8", mega_body(128, 8))
    measure("mega_b256_ppl8", mega_body(256, 8))


if __name__ == "__main__":
    main()
