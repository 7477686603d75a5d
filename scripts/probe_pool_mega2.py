"""Decisive mega-vs-pair A/B at b256/ppl4 (first probe was ambiguous:
slope said mega -0.6 ms, reps-8 walls said equal).  reps {2,8,32},
5 walls each, min per reps; report the long-baseline slope (w32-w2)/30
which cancels fixed overhead with 5x the signal of (w8-w2)/6."""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")

import jax.numpy as jnp

from bench import _time_slope
from noize_tpu.erosion import pool_pallas as PP
from noize_tpu.ops.fractal import fractal

RES = 2048


def main():
    hb = jax.block_until_ready(jax.jit(
        lambda: fractal(RES, 0, 0, noise_type="Simplex", octaves=13,
                        hurst=0.4, noise_size=1700.0))())
    w_dense = jnp.full((RES, RES), 1e-3, jnp.float32)

    def eps(k):
        return jax.random.uniform(k, (), minval=0.0, maxval=1e-9)

    def pair_body(k):
        p, d = PP.pool_automata_pallas_pair_fused(
            hb + eps(k), w_dense, iterations=10, drain_particles=True,
            block=256, phases_per_launch=4, unroll=True)
        return p[0, 0] + d.sum()

    def mega_body(k):
        p, d = PP.pool_automata_pallas_mega(
            hb + eps(k), w_dense, iterations=10, drain_particles=True,
            block=256, phases_per_launch=4)
        return p[0, 0] + d.sum()

    for name, body in (("prod_pair", pair_body), ("mega", mega_body)):
        r = _time_slope(body, reps_list=(2, 8, 32), n_walls=5)
        print(json.dumps({"probe": name, **r}), flush=True)


if __name__ == "__main__":
    main()
