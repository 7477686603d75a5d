"""TPU probe (round 3b): is the pool demux/rank cost in the INT ops and
i1-mask materializations?  Variants: (a) production, (b) rank carried in
f32 (no int adds / casts), (c) f32 one-hot hits + MAC demux.
All variants are value-identical for the routing (small exact ints in
f32); only perf is compared here — adoption would re-verify bit-exactness
through the suite.
"""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp
from noize_tpu.erosion import pool as PO
from noize_tpu.erosion import pool_pallas as PP

RES, REPS = 2048, 8
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
        jax.clear_caches()
        @jax.jit
        def run(key):
            def body(carry, k):
                hh = h + carry * 1e-20
                p, d = PP.pool_automata_pallas_pair_fused(
                    hh, w, iterations=10, drain_particles=True, block=128,
                    phases_per_launch=4, unroll=True)
                return carry + p[0, 0] + d[0, 0], None
            total, _ = jax.lax.scan(body, jnp.float32(0.0),
                                    jax.random.split(key, REPS))
            return total
        t0 = time.perf_counter(); float(run(jax.random.PRNGKey(1)))
        cs = time.perf_counter() - t0
        best = None
        for trial in range(2):
            r = rtt()
            walls = []
            for seed in (2, 3):
                t0 = time.perf_counter()
                float(run(jax.random.PRNGKey(seed)))
                walls.append((time.perf_counter() - t0) * 1e3)
            ms = max(min(walls) - r, min(walls) * 0.2) / REPS
            best = ms if best is None else min(best, ms)
        print(json.dumps({"ablate": name, "ms_per_call": round(best, 2),
                          "compile_s": round(cs, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"ablate": name,
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)

orig = PO._phase_core
run_one("prod_int_rank")


def make_core(f32_rank: bool, mac_demux: bool):
    def core(n_height, n_water, h_land, pool_snapshot, geo_mask,
             drain_particles, hl_ge_nh=None):
        if hl_ge_nh is None:
            hl_ge_nh = [h_land >= n_height[d] for d in range(4)]
        keys = [n_height[d] + n_water[d] for d in range(4)]
        elig = [(n_water[d] <= 0.0) & hl_ge_nh[d] for d in range(4)]
        if f32_rank:
            conv = lambda b: jnp.where(b, jnp.float32(1.0), jnp.float32(0.0))
            three, two, one_c = 3.0, 2.0, 1.0
            ecmp = lambda r, e: r == float(e)
        else:
            conv = lambda b: b.astype(jnp.int32)
            three, two, one_c = 3, 2, 1
            ecmp = lambda r, e: r == e
        a01 = conv(keys[0] <= keys[1]); a02 = conv(keys[0] <= keys[2])
        a03 = conv(keys[0] <= keys[3]); a12 = conv(keys[1] <= keys[2])
        a13 = conv(keys[1] <= keys[3]); a23 = conv(keys[2] <= keys[3])
        rank = [three - a01 - a02 - a03, two + a01 - a12 - a13,
                one_c + a02 + a12 - a23, a03 + a13 + a23]
        hits = [[ecmp(rank[d], e) for e in range(4)] for d in range(4)]

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
        moved_s, drain_s = [], []
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
            moved_s.append(moved)
            drain_s.append(elig_e)

        if mac_demux:
            hf = [[jnp.where(hits[d][e], jnp.float32(1.0), jnp.float32(0.0))
                   for e in range(4)] for d in range(4)]
            all_d = [
                hf[d][0] * moved_s[0] + hf[d][1] * moved_s[1]
                + hf[d][2] * moved_s[2] + hf[d][3] * moved_s[3]
                for d in range(4)
            ]
        else:
            all_d = [
                jnp.where(hits[d][0], moved_s[0],
                          jnp.where(hits[d][1], moved_s[1],
                                    jnp.where(hits[d][2], moved_s[2],
                                              moved_s[3])))
                for d in range(4)
            ]
        drain_amt = jnp.where(drain_s[0], moved_s[0], 0.0)
        for e in range(1, 4):
            drain_amt = drain_amt + jnp.where(drain_s[e], moved_s[e], 0.0)
        if f32_rank:
            dvals = [jnp.float32(x) for x in (0.0, 1.0, 2.0, 3.0, -1.0)]
        else:
            dvals = [jnp.int32(x) for x in (0, 1, 2, 3, -1)]
        drain_e = jnp.where(
            drain_s[0], dvals[0],
            jnp.where(drain_s[1], dvals[1],
                      jnp.where(drain_s[2], dvals[2],
                                jnp.where(drain_s[3], dvals[3], dvals[4]))))
        drain_out = [jnp.where(rank[d] == drain_e, drain_amt, 0.0)
                     for d in range(4)]
        deltas = [all_d[d] - drain_out[d] for d in range(4)]
        return h_water, deltas, drain_out
    return core


PO._phase_core = make_core(f32_rank=True, mac_demux=False)
run_one("f32_rank_select")
PO._phase_core = make_core(f32_rank=True, mac_demux=True)
run_one("f32_rank_mac")
PO._phase_core = make_core(f32_rank=False, mac_demux=True)
run_one("int_rank_mac")
PO._phase_core = orig
