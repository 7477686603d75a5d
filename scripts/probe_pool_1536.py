import json, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp
from bench import _time_slope
from noize_tpu.erosion import pool_pallas as PP
from noize_tpu.ops.fractal import fractal

res = 1536  # r2=768 -> b128 rung (768 % 256 != 0)
hb = jax.block_until_ready(jax.jit(
    lambda: fractal(res, 0, 0, noise_type="Simplex", octaves=13,
                    hurst=0.4, noise_size=1700.0))())
w = jnp.full((res, res), 1e-3, jnp.float32)

def eps(k):
    return jax.random.uniform(k, (), minval=0.0, maxval=1e-9)

p0, d0 = jax.block_until_ready(PP.pool_automata_pallas_pair_fused(
    hb, w, iterations=10, drain_particles=True, block=128,
    phases_per_launch=8, unroll=True))
p1, d1 = jax.block_until_ready(PP.pool_automata_pallas_mega(
    hb, w, iterations=10, drain_particles=True, block=128,
    phases_per_launch=4))
print(json.dumps({"probe": "bitexact_1536",
                  "bit_equal": bool(jnp.array_equal(p0, p1)
                                    & jnp.array_equal(d0, d1))}), flush=True)

for name, fn in (
    ("pair_b128_ppl8_1536", lambda h, p: PP.pool_automata_pallas_pair_fused(
        h, p, iterations=10, drain_particles=True, block=128,
        phases_per_launch=8, unroll=True)),
    ("mega_b128_ppl4_1536", lambda h, p: PP.pool_automata_pallas_mega(
        h, p, iterations=10, drain_particles=True, block=128,
        phases_per_launch=4)),
):
    def body(k, fn=fn):
        p, d = fn(hb + eps(k), w)
        return p[0, 0] + d.sum()
    r = _time_slope(body, reps_list=(2, 8), n_walls=3)
    print(json.dumps({"probe": name, "slope_ms_per_call": r["slope_8_2"],
                      "min_walls_ms": r["min_walls_ms"]}), flush=True)
