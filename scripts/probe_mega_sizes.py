"""Round-5 probe: the production mega pool kernel across grid sizes.

The round-5 production flip (sim._gated_pool → pool_automata_pallas_mega)
was A/B'd at 2048² only; this validates the geometry ladder at the other
production sizes:

  1024²  (interactive)  r2=512  → b256/ppl4 (r2%256==0)
  4096²  (large worlds) r2=2048 → b256/ppl4; VMEM window 6×(272,4096)f32
                        ≈ 26 MB — needs the raised vmem limit, worth an
                        on-chip compile/correctness check

Per size: one on-chip bit-exact A/B vs the pair-fused reference, then
slope timings ((w8-w2)/6) for mega and pair_fused.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")

import jax.numpy as jnp

from bench import _time_slope
from noize_tpu.erosion import pool_pallas as PP
from noize_tpu.ops.fractal import fractal


def eps(k):
    return jax.random.uniform(k, (), minval=0.0, maxval=1e-9)


def main():
    for res in (1024, 4096):
        hb = jax.block_until_ready(jax.jit(
            lambda res=res: fractal(res, 0, 0, noise_type="Simplex",
                                    octaves=13, hurst=0.4,
                                    noise_size=1700.0))())
        w_dense = jnp.full((res, res), 1e-3, jnp.float32)

        try:
            p0, d0 = jax.block_until_ready(PP.pool_automata_pallas_pair_fused(
                hb, w_dense, iterations=10, drain_particles=True,
                block=256, phases_per_launch=4, unroll=True))
            p1, d1 = jax.block_until_ready(PP.pool_automata_pallas_mega(
                hb, w_dense, iterations=10, drain_particles=True,
                block=256, phases_per_launch=4))
            print(json.dumps({
                "probe": f"mega_bitexact_{res}",
                "bit_equal": bool(jnp.array_equal(p0, p1)
                                  & jnp.array_equal(d0, d1)),
                "max_abs_diff": float(jnp.abs(p0 - p1).max()),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"probe": f"mega_bitexact_{res}",
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            continue

        for name, fn in (
            ("pair_b256_ppl4", lambda h, p: PP.pool_automata_pallas_pair_fused(
                h, p, iterations=10, drain_particles=True, block=256,
                phases_per_launch=4, unroll=True)),
            ("mega_b256_ppl4", lambda h, p: PP.pool_automata_pallas_mega(
                h, p, iterations=10, drain_particles=True, block=256,
                phases_per_launch=4)),
        ):
            def body(k, fn=fn):
                p, d = fn(hb + eps(k), w_dense)
                return p[0, 0] + d.sum()
            try:
                r = _time_slope(body, reps_list=(2, 8), n_walls=3)
                print(json.dumps({
                    "probe": f"{name}_{res}",
                    "slope_ms_per_call": r["slope_8_2"],
                    "min_walls_ms": r["min_walls_ms"],
                }), flush=True)
            except Exception as e:
                print(json.dumps({"probe": f"{name}_{res}",
                                  "error": f"{type(e).__name__}: {e}"[:300]}),
                      flush=True)


if __name__ == "__main__":
    main()
