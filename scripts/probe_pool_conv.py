"""Probe: does the pool automata reach an EXACT f32 fixed point before
its 10 water steps at the flagship's real water shapes?

The pool kernel (erosion/pool.py::_phase_core) gates every transfer on
``h_water >= 1e-3`` and all transfers are clip-forms of 0.25*diff; once
spreading flattens, per-step moves can round to exactly zero (f32
absorption) or every wet cell can fall below the gate.  If step k's pool
output is BIT-IDENTICAL to its input, every later step is too (the step
is a pure function of (height, pool); a drain or transfer always changes
pool), so the remaining launches can be skipped bit-exactly.  Each
skipped water step is worth ~0.65 ms x 3 cycles on the flagship
(BENCH_HISTORY r4: per-phase compute c=0.129 ms).

Runs the flagship chain (app/flagship.py) EAGERLY on CPU with the pool
call split into iterations=1 sub-calls (bit-exact: sequential drain adds)
and records per-step changed-cell counts.

Usage: PALLAS_AXON_POOL_IPS= python scripts/probe_pool_conv.py [cycles]
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import noize_tpu.erosion.sim as sim
from noize_tpu.app.flagship import default_meta, default_settings
from noize_tpu.erosion.pool import pool_automata
from noize_tpu.erosion.sim import erosion_cycle, init_state
from noize_tpu.ops import flow as _flow
from noize_tpu.ops import kernels as _kernels
from noize_tpu.ops.fractal import fractal

STATS = []


def instrumented_pool(height, pool, iterations=10, drain_particles=True):
    drains = jnp.zeros_like(pool)
    p = pool
    steps = []
    for _ in range(iterations):
        p2, d = pool_automata(height, p, iterations=1,
                              drain_particles=drain_particles)
        changed = int((p2 != p).sum())
        maxd = float(jnp.abs(p2 - p).max())
        dnz = int((d != 0.0).sum())
        wet = int((p2 >= 1e-3).sum())
        steps.append(dict(changed=changed, max_delta=maxd,
                          drain_cells=dnz, wet_cells=wet,
                          max_pool=float(p2.max())))
        p, drains = p2, drains + d
    STATS.append(steps)
    return p, drains


def main():
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    xpos = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
    zpos = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    sim.pool_automata = instrumented_pool  # CPU path calls this name

    meta = default_meta()
    settings = default_settings()
    res = meta.generator_res
    print(f"flagship shape probe: res={res} cycles={cycles} "
          f"water_steps={settings.WATER_STEPS} "
          f"xpos={xpos} zpos={zpos} seed={seed}", flush=True)

    t0 = time.time()
    h = fractal(res, xpos, zpos, noise_type="Simplex", hurst=0.4,
                octaves=13, noise_size=1700.0)
    taps = jnp.asarray(_kernels.gaussian_taps(1.0, 5))
    for _ in range(17):
        h = _kernels.separable_series(h, taps, taps, 1.0)
    _flow.flow_map(h, iterations=8)  # parity with the flagship chain
    print(f"noise+blur+flow done {time.time()-t0:.1f}s", flush=True)

    state = init_state(h, jax.random.PRNGKey(seed))
    for c in range(cycles):
        t1 = time.time()
        # erosion_cycle is jitted — run the unwrapped body eagerly so the
        # instrumented pool can materialize per-step stats
        cyc = getattr(erosion_cycle, "__wrapped__", erosion_cycle)
        state = cyc(state, settings, meta)
        steps = STATS[-1]
        print(f"\ncycle {c} ({time.time()-t1:.1f}s): "
              f"pool wet={steps[-1]['wet_cells']}", flush=True)
        for i, s in enumerate(steps):
            print(f"  step {i}: changed={s['changed']:8d} "
                  f"max|d|={s['max_delta']:.3e} "
                  f"drain_cells={s['drain_cells']:6d} "
                  f"wet={s['wet_cells']:8d} "
                  f"max_pool={s['max_pool']:.3e}", flush=True)
        conv = next((i for i, s in enumerate(steps) if s["changed"] == 0),
                    None)
        print(f"  exact fixed point at step: {conv}", flush=True)


if __name__ == "__main__":
    main()
