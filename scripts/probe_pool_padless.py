"""Round-4 probe: the padless-carry pair-fused pool kernel.

The reconciliation probe (probe_pool_recon) showed the production kernel
really costs ~7.4 ms/call (slope method) with ~1.2 ms of that in XLA
edge-pad copies re-padding the 4 scan carries before every launch.  The
kernel now clamps its own carry DMA windows at the grid edges (see
pool_pallas._fused_pair_call) so only the call-constant heights are
padded, once per call.

Readouts (bench-exact body: fractal terrain, dense 1e-3 water,
p[0,0]+d.sum(), 10 iterations):
  padless_ppl4_b128   production config with the new kernel
  padless_ppl8_b128   fewer launches — pad glue is gone, so the round-3
                      "no win over ppl4" result may have flipped
Primary readout is the reps slope ((w8-w2)/6): fixed offsets cancel.
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

    def body_with(ppl):
        def body(k):
            p, d = PP.pool_automata_pallas_pair_fused(
                hb + eps(k), w_dense, iterations=10, drain_particles=True,
                block=128, phases_per_launch=ppl, unroll=True)
            return p[0, 0] + d.sum()
        return body

    measure("padless_ppl4_b128", body_with(4))
    measure("padless_ppl8_b128", body_with(8))


if __name__ == "__main__":
    main()
