"""Round-4 probe: the prefetch pool kernel (padded uniform windows +
double-buffered cross-block input DMA), standalone AND in the flagship.

The three-point fit put per-launch fixed overhead at Lf = 0.091 ms —
mostly exposed input-DMA latency at each block step.  The kernel now
prefetches block i+1's six windows while block i computes.  Also
re-measures the flagship chained walls for pool b256 vs b128 IN-CHAIN:
the b256 standalone win (6.74) coincided with a flagship wall
regression (54.06 → 56.88) that needs disambiguating from session
variance (the phase entries of that run were also CPU-contended).

Readouts: pool slopes for ppl4/b256, ppl4/b128, ppl8/b128 with the
prefetch kernel; flagship chained K=8 walls with the pool forced to
b256 then b128 (monkeypatched pool kwargs, same session → variance
cancels).
"""
import functools
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


def flagship(tag, ppl, blk):
    """Flagship chained K=8 with the pool kernel forced to (ppl, blk)."""
    from noize_tpu.app.flagship import make_tile_step
    from noize_tpu.core.tiles import TileSetMeta
    from noize_tpu.erosion.params import ErosionSettings

    orig = PP.pool_automata_pallas_pair_fused

    @functools.wraps(orig)
    def forced(height, pool, iterations=10, drain_particles=True,
               block=None, phases_per_launch=4, unroll=True):
        return orig(height, pool, iterations=iterations,
                    drain_particles=drain_particles, block=blk,
                    phases_per_launch=ppl, unroll=unroll)

    PP.pool_automata_pallas_pair_fused = forced
    try:
        margin = 16
        meta = TileSetMeta(
            tile_res=RES - 2 * margin, tile_size=RES - 2 * margin,
            generator_res=RES, height=1000, margin=margin).validate()
        settings = ErosionSettings()
        step, _, _ = make_tile_step(
            meta, settings, octaves=13, blur_iterations=17,
            flow_iterations=8, erosion_cycles=settings.CYCLES,
            emit_mesh=True, mesh_layout="planes")
        K = 8

        @jax.jit
        def run(key):
            def body(carry, k):
                out = step(
                    jax.random.uniform(k, (), minval=0, maxval=1000.0),
                    jax.random.uniform(jax.random.fold_in(k, 1), (),
                                       minval=0, maxval=1000.0), k)
                s = (out["height"].sum() + out["stream"].sum()
                     + out["mesh"].planes.sum())
                return carry + s, None
            total, _ = jax.lax.scan(body, jnp.float32(0.0),
                                    jax.random.split(key, K))
            return total

        t0 = time.perf_counter()
        float(run(jax.random.PRNGKey(1)))
        compile_s = time.perf_counter() - t0
        walls = []
        for seed in (2, 3, 4):
            t0 = time.perf_counter()
            float(run(jax.random.PRNGKey(seed)))
            walls.append((time.perf_counter() - t0) * 1e3)
        rtt = _measure_rtt()
        wall = min(walls)
        print(json.dumps({
            "probe": tag,
            "ms_per_step": round(max(wall - rtt, wall * 0.5) / K, 3),
            "walls": [round(w, 1) for w in walls],
            "live_rtt_ms": round(rtt, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)
    except Exception as e:
        print(json.dumps({"probe": tag,
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)
    finally:
        PP.pool_automata_pallas_pair_fused = orig


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

    measure("prefetch_ppl4_b256", body_with(4, 256))
    measure("prefetch_ppl4_b128", body_with(4, 128))
    measure("prefetch_ppl8_b128", body_with(8, 128))
    flagship("flagship_prefetch_b256", 4, 256)
    flagship("flagship_prefetch_b128_ppl8", 8, 128)


if __name__ == "__main__":
    main()
