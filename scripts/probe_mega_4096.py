"""Round-5 probe: 4096² pool kernels — compile envelope + numerics.

probe_mega_sizes.py found the 4096² compile envelope: pair-fused fails
at b256 AND b128, mega fails at b256, **mega b128 is the only
geometry the TPU compile accepts** (remote compile 500s otherwise).
This probe (a) bit-exact A/Bs mega b128 against the XLA half-row path
on-chip at 4096² (the pair kernel can't be the reference here), and
(b) slope-times mega b128 and the XLA path at that size — the numbers
behind sim._gated_pool's 2.5 MB/window ladder cap.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")

import jax.numpy as jnp

from bench import _time_slope
from noize_tpu.erosion import pool as PO
from noize_tpu.erosion import pool_pallas as PP
from noize_tpu.ops.fractal import fractal

RES = 4096


def eps(k):
    return jax.random.uniform(k, (), minval=0.0, maxval=1e-9)


def main():
    hb = jax.block_until_ready(jax.jit(
        lambda: fractal(RES, 0, 0, noise_type="Simplex", octaves=13,
                        hurst=0.4, noise_size=1700.0))())
    w = jnp.full((RES, RES), 1e-3, jnp.float32)

    try:
        p0, d0 = jax.block_until_ready(PO.pool_automata(
            hb, w, iterations=10, drain_particles=True))
        p1, d1 = jax.block_until_ready(PP.pool_automata_pallas_mega(
            hb, w, iterations=10, drain_particles=True,
            block=128, phases_per_launch=4))
        print(json.dumps({
            "probe": "mega_b128_vs_xla_4096",
            "bit_equal": bool(jnp.array_equal(p0, p1)
                              & jnp.array_equal(d0, d1)),
            "max_abs_diff": float(jnp.abs(p0 - p1).max()),
        }), flush=True)
    except Exception as e:
        print(json.dumps({"probe": "mega_b128_vs_xla_4096",
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)

    for name, fn in (
        ("mega_b128_4096", lambda h, p: PP.pool_automata_pallas_mega(
            h, p, iterations=10, drain_particles=True, block=128,
            phases_per_launch=4)),
        ("xla_halfrow_4096", lambda h, p: PO.pool_automata(
            h, p, iterations=10, drain_particles=True)),
    ):
        def body(k, fn=fn):
            p, d = fn(hb + eps(k), w)
            return p[0, 0] + d.sum()
        try:
            r = _time_slope(body, reps_list=(2, 8), n_walls=3)
            print(json.dumps({
                "probe": name,
                "slope_ms_per_call": r["slope_8_2"],
                "min_walls_ms": r["min_walls_ms"],
            }), flush=True)
        except Exception as e:
            print(json.dumps({"probe": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
