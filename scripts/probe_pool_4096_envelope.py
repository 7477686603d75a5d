"""Round-5 probe: which pool kernel geometries COMPILE at 4096² —
pair b256/b128 and mega b256 all fail the TPU compile; mega b128 works
(BENCH_HISTORY round 5; argv[1] in {pair, pair_b128, mega, mega_b128}).
"""
import json, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp
from noize_tpu.erosion import pool_pallas as PP
from noize_tpu.ops.fractal import fractal

res = 4096
hb = jax.block_until_ready(jax.jit(
    lambda: fractal(res, 0, 0, noise_type="Simplex", octaves=13,
                    hurst=0.4, noise_size=1700.0))())
w = jnp.full((res, res), 1e-3, jnp.float32)

which = sys.argv[1]
try:
    if which == "pair":
        p, d = PP.pool_automata_pallas_pair_fused(
            hb, w, iterations=10, drain_particles=True,
            block=256, phases_per_launch=4, unroll=True)
    elif which == "pair_b128":
        p, d = PP.pool_automata_pallas_pair_fused(
            hb, w, iterations=10, drain_particles=True,
            block=128, phases_per_launch=4, unroll=True)
    elif which == "mega":
        p, d = PP.pool_automata_pallas_mega(
            hb, w, iterations=10, drain_particles=True,
            block=256, phases_per_launch=4)
    elif which == "mega_b128":
        p, d = PP.pool_automata_pallas_mega(
            hb, w, iterations=10, drain_particles=True,
            block=128, phases_per_launch=4)
    jax.block_until_ready(p)
    print(json.dumps({"probe": f"{which}_4096", "ok": True,
                      "psum": float(p.sum()), "dsum": float(d.sum())}))
except Exception as e:
    print(json.dumps({"probe": f"{which}_4096",
                      "error": f"{type(e).__name__}: {e}"[:200]}))
