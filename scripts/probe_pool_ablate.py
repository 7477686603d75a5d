"""TPU probe (round 3): pool phase-body ablation — which part of the
rank-based core actually costs?  Monkeypatches pool internals with
stripped variants (WRONG results, perf only) and times the production
pair-fused call shape at 2048².
"""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp
from noize_tpu.erosion import pool as PO
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
        t0 = time.perf_counter(); float(_ping(jnp.float32(i)))
        walls.append((time.perf_counter() - t0) * 1e3)
    return max(min(walls), 1.0)

def run_one(name):
    try:
        jax.clear_caches()  # the inner jit must retrace the monkeypatch
        fn = lambda hh, ww: PP.pool_automata_pallas_pair_fused(
            hh, ww, iterations=10, drain_particles=True, block=128,
            phases_per_launch=4, unroll=True)

        def make(key):
            def body(carry, k):
                hh = h + carry * 1e-20
                p, d = fn(hh, w)
                return carry + p[0, 0] + d[0, 0], None
            total, _ = jax.lax.scan(body, jnp.float32(0.0),
                                    jax.random.split(key, REPS))
            return total
        run = jax.jit(make)
        t0 = time.perf_counter(); float(run(jax.random.PRNGKey(1)))
        cs = time.perf_counter() - t0
        r = rtt()
        walls = []
        for seed in (2, 3):
            t0 = time.perf_counter(); float(run(jax.random.PRNGKey(seed)))
            walls.append((time.perf_counter() - t0) * 1e3)
        ms = max(min(walls) - r, min(walls) * 0.2) / REPS
        print(json.dumps({"ablate": name, "ms_per_call": round(ms, 2),
                          "rtt": round(r, 1), "compile_s": round(cs, 1)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"ablate": name,
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)

orig_core = PO._phase_core

run_one("full")

# --- a) demux removed (substeps + rank kept, outputs zero) ------------------
def core_no_demux(n_height, n_water, h_land, pool_snapshot, geo_mask,
                  drain_particles, hl_ge_nh=None):
    hw, deltas, drains = orig_core(n_height, n_water, h_land, pool_snapshot,
                                   geo_mask, drain_particles, hl_ge_nh)
    z = [jnp.zeros_like(pool_snapshot) for _ in range(4)]
    return hw, z, z

# can't just zero outputs AFTER the call — XLA would DCE the demux; strip
# inside instead:
def core_no_demux2(n_height, n_water, h_land, pool_snapshot, geo_mask,
                   drain_particles, hl_ge_nh=None):
    if hl_ge_nh is None:
        hl_ge_nh = [h_land >= n_height[d] for d in range(4)]
    keys = [n_height[d] + n_water[d] for d in range(4)]
    elig = [(n_water[d] <= 0.0) & hl_ge_nh[d] for d in range(4)]
    a01 = (keys[0] <= keys[1]).astype(jnp.int32)
    a02 = (keys[0] <= keys[2]).astype(jnp.int32)
    a03 = (keys[0] <= keys[3]).astype(jnp.int32)
    a12 = (keys[1] <= keys[2]).astype(jnp.int32)
    a13 = (keys[1] <= keys[3]).astype(jnp.int32)
    a23 = (keys[2] <= keys[3]).astype(jnp.int32)
    rank = [3 - a01 - a02 - a03, 2 + a01 - a12 - a13,
            1 + a02 + a12 - a23, a03 + a13 + a23]
    hits = [[rank[d] == e for e in range(4)] for d in range(4)]

    def pick(e, fields):
        return tuple(
            jnp.where(hits[0][e], f[0],
                      jnp.where(hits[1][e], f[1],
                                jnp.where(hits[2][e], f[2], f[3])))
            for f in fields)

    def pick_bool(e, f):
        return ((hits[0][e] & f[0]) | (hits[1][e] & f[1])
                | (hits[2][e] & f[2]) | (hits[3][e] & f[3]))

    h_water = pool_snapshot
    t_height = h_land + h_water
    moveds = []
    for e in range(4):
        key_e, bw_e = pick(e, (keys, n_water))
        elig_e = pick_bool(e, elig)
        diff_v = t_height - key_e
        can = geo_mask & (h_water >= 1e-3)
        clipv = jnp.minimum(jnp.maximum(0.25 * diff_v, -0.25 * bw_e),
                            0.25 * h_water)
        moved = jnp.where(can, jnp.where(elig_e, h_water, clipv), 0.0)
        h_water = h_water - moved
        t_height = h_land + h_water
        moveds.append(moved)
    # fake outputs that keep the substeps alive but skip the demux
    s = moveds[0] * 1e-30
    fake = [s, s, s, s]
    return h_water, fake, fake

PO._phase_core = core_no_demux2
run_one("no_demux")
PO._phase_core = orig_core

# --- b) rank/selection removed (fixed direction order, demux kept) ----------
def core_no_rank(n_height, n_water, h_land, pool_snapshot, geo_mask,
                 drain_particles, hl_ge_nh=None):
    if hl_ge_nh is None:
        hl_ge_nh = [h_land >= n_height[d] for d in range(4)]
    keys = [n_height[d] + n_water[d] for d in range(4)]
    elig = [(n_water[d] <= 0.0) & hl_ge_nh[d] for d in range(4)]
    h_water = pool_snapshot
    t_height = h_land + h_water
    moved_s, drain_s = [], []
    for e in range(4):
        key_e, bw_e, elig_e = keys[e], n_water[e], elig[e]
        diff_v = t_height - key_e
        can = geo_mask & (h_water >= 1e-3)
        clipv = jnp.minimum(jnp.maximum(0.25 * diff_v, -0.25 * bw_e),
                            0.25 * h_water)
        moved = jnp.where(can, jnp.where(elig_e, h_water, clipv), 0.0)
        h_water = h_water - moved
        t_height = h_land + h_water
        moved_s.append(moved)
        drain_s.append(elig_e)
    moved_nd = [jnp.where(drain_s[e], 0.0, moved_s[e]) for e in range(4)]
    moved_dr = [jnp.where(drain_s[e], moved_s[e], 0.0) for e in range(4)]
    return h_water, moved_nd, moved_dr

PO._phase_core = core_no_rank
run_one("no_rank")
PO._phase_core = orig_core

# --- c) minimal body: one clip per direction, no serial chain ----------------
def core_minimal(n_height, n_water, h_land, pool_snapshot, geo_mask,
                 drain_particles, hl_ge_nh=None):
    h_water = pool_snapshot
    outs = []
    for e in range(4):
        diff_v = (h_land + h_water) - (n_height[e] + n_water[e])
        clipv = jnp.minimum(jnp.maximum(0.25 * diff_v, -0.25 * n_water[e]),
                            0.25 * h_water)
        outs.append(jnp.where(geo_mask, clipv, 0.0))
    return h_water - outs[0] * 1e-6, outs, outs

PO._phase_core = core_minimal
run_one("minimal_core")
PO._phase_core = orig_core
