"""TPU probe (round 3): rank-based pool core — pair_fused block/ppl sweep.

Measures the production pair-fused kernel after the _phase_core rewrite
(rank comparisons + clip transfer + post-loop demux + hoisted heights),
with a live RTT measurement per entry (chained-scalar method, see
bench.py::_time_chained and CLAUDE.md's measurement notes).
"""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp
from noize_tpu.erosion import pool_pallas as PP

RES, REPS = 2048, 4
rng = np.random.default_rng(5)
h = jnp.asarray(rng.uniform(0, 1, (RES, RES)).astype(np.float32))
w = jnp.asarray((rng.uniform(-0.1, 0.05, (RES, RES))).clip(0).astype(np.float32))

_ping = jax.jit(lambda x: x + 1.0)
float(_ping(jnp.float32(0.0)))

def rtt():
    walls = []
    for i in range(5):
        t0 = time.perf_counter()
        float(_ping(jnp.float32(i)))
        walls.append((time.perf_counter() - t0) * 1e3)
    return max(min(walls), 1.0)

def safe(name, fn):
    try:
        @jax.jit
        def run(key):
            def body(carry, k):
                hh = h + carry * 1e-20
                p, d = fn(hh, w)
                return carry + p[0, 0] + d[0, 0], None
            total, _ = jax.lax.scan(body, jnp.float32(0.0), jax.random.split(key, REPS))
            return total
        t0 = time.perf_counter(); float(run(jax.random.PRNGKey(1))); cs = time.perf_counter() - t0
        r = rtt()
        walls = []
        for seed in (2, 3):
            t0 = time.perf_counter(); float(run(jax.random.PRNGKey(seed)))
            walls.append((time.perf_counter() - t0) * 1e3)
        wall = min(walls)
        ms = max(wall - r, wall * 0.2) / REPS
        print(json.dumps({"probe": name, "ms_per_call": round(ms, 2),
                          "rtt_ms": round(r, 1), "compile_s": round(cs, 1)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": f"{type(e).__name__}: {e}"[:300]}), flush=True)

CONFIGS = [
    ("pair_fused b128 ppl4 unroll", dict(block=128, phases_per_launch=4, unroll=True)),
    ("pair_fused b256 ppl4 unroll", dict(block=256, phases_per_launch=4, unroll=True)),
    ("pair_fused b64 ppl4 unroll", dict(block=64, phases_per_launch=4, unroll=True)),
    ("pair_fused b64 ppl8 unroll", dict(block=64, phases_per_launch=8, unroll=True)),
    ("pair_fused b128 ppl8 unroll", dict(block=128, phases_per_launch=8, unroll=True)),
    ("pair_fused b256 ppl8 unroll", dict(block=256, phases_per_launch=8, unroll=True)),
    ("pair_fused b128 ppl2 unroll", dict(block=128, phases_per_launch=2, unroll=True)),
]
for name, kw in CONFIGS:
    safe(name, lambda hh, ww, kw=kw: PP.pool_automata_pallas_pair_fused(
        hh, ww, iterations=10, drain_particles=True, **kw))

# per-phase pair kernel for reference (no fusion)
safe("pair per-phase b256", lambda hh, ww: PP.pool_automata_pallas_pair(
    hh, ww, iterations=10, drain_particles=True, block=256))
