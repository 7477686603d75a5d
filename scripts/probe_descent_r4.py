"""Round-4 probe: two descent moves per gather (VERDICT r3 item 4).

A 5x5 patch prefetched every 2 steps serves both steps' 3x3 map reads
with one-hot contractions.  The existing patch path gathers the 3-map
(wih, all_h, flow) table: 75 values/particle = 75K elements per span
gather at N=1000 — past the measured ~25K gather knee.  Readouts:

  descent_gather_per_step   patch_k=0 production baseline
  descent_patch_k2          patch_k=2 (5x5, 3 maps, existing bit-exact path)
  descent_patch_k4          patch_k=4 (9x9, 3 maps) — 4 moves per gather

Primary readout is the reps-slope (fixed offsets cancel).  If none beat
the baseline, descent is declared closed permanently at its gather-chain
floor (101 x ~0.135 ms fixed gather cost).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")

import jax.numpy as jnp

from bench import _measure_rtt
from noize_tpu.core.tiles import TileSetMeta
from noize_tpu.erosion import particles as PART
from noize_tpu.erosion.params import ErosionSettings
from noize_tpu.erosion.world import WorldState
from noize_tpu.ops.fractal import fractal

RES = 2048
MARGIN = 16


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
    return min(walls), compile_s


def main():
    meta = TileSetMeta(tile_res=RES - 2 * MARGIN, tile_size=RES - 2 * MARGIN,
                       generator_res=RES, height=1000, margin=MARGIN)
    es = ErosionSettings()
    params = es.as_parameters()
    hb = jax.block_until_ready(jax.jit(
        lambda: fractal(RES, 0, 0, noise_type="Simplex", octaves=13,
                        hurst=0.4, noise_size=1700.0))())

    def eps(k):
        return jax.random.uniform(k, (), minval=0.0, maxval=1e-9)

    def body_with(patch_k):
        def body(k):
            parts = PART.spawn(k, es.PARTICLES_PER_CYCLE, RES)
            w = WorldState.create(hb + eps(k))
            _, t, p_, s = PART.descend_all(
                parts, w, params, float(meta.height), meta.patch_res, RES,
                patch_k=patch_k)
            return t.sum() + p_.sum() + s.sum()
        return body

    for name, pk in [("descent_gather_per_step", 0),
                     ("descent_patch_k2", 2),
                     ("descent_patch_k4", 4)]:
        try:
            w2, cs2 = chained(body_with(pk), 2)
            w4, cs4 = chained(body_with(pk), 4)
            rtt = _measure_rtt()
            print(json.dumps({
                "probe": name,
                "slope_ms_per_call": round((w4 - w2) / 2.0, 2),
                "std_method_reps4_ms": round(
                    max(w4 - rtt, w4 * 0.2) / 4.0, 2),
                "min_wall_reps2_ms": round(w2, 1),
                "min_wall_reps4_ms": round(w4, 1),
                "live_rtt_ms": round(rtt, 1),
                "compile_s": [round(cs2, 1), round(cs4, 1)],
            }), flush=True)
        except Exception as e:
            print(json.dumps({"probe": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
