"""Consolidated round-3b TPU probe: mesh emission layouts, pool automata
at production water sparsity, and the flagship arrays-vs-planes choice.
One tunnel session answers all three (prints incrementally).
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")

from bench import _time_chained
from noize_tpu.ops import mesh as MH
from noize_tpu.ops.fractal import fractal

RES = 2048
TILE = RES - 32


def _eps(k):
    return jax.random.uniform(k, (), minval=0.0, maxval=1e-6)


def main():
    h = jax.block_until_ready(jax.jit(
        lambda: fractal(RES, 7, 0, noise_type="Simplex", octaves=13,
                        hurst=0.4, noise_size=1700.0))())

    # --- 1. mesh layouts -------------------------------------------------
    def cur_pos(k):
        m = MH.heightmap_mesh_overshoot(h + _eps(k), TILE, RES, 1000.0,
                                        float(TILE))
        return m.positions.sum()

    def cur_all(k):
        m = MH.heightmap_mesh_overshoot(h + _eps(k), TILE, RES, 1000.0,
                                        float(TILE))
        return (m.positions.sum() + m.normals.sum() + m.tangents.sum()
                + m.uvs.sum())

    def planes_all(k):
        m = MH.heightmap_mesh_overshoot_planes(h + _eps(k), TILE, RES,
                                               1000.0, float(TILE))
        return m.planes.sum()

    for name, fn in [("mesh_arrays_positions_only", cur_pos),
                     ("mesh_arrays_all_fields", cur_all),
                     ("mesh_planes_all", planes_all)]:
        try:
            print(f"{name}: {_time_chained(fn, reps=8):.3f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {e}"[:200], flush=True)

    # --- 2. pool at production sparsity (fused kernel) -------------------
    from noize_tpu.erosion import pool_pallas as PP

    rng = np.random.default_rng(5)
    dense = jnp.full((RES, RES), 1e-3, jnp.float32)
    third = jnp.asarray(
        rng.uniform(-0.1, 0.05, (RES, RES)).clip(0).astype(np.float32))
    basin = jnp.zeros((RES, RES), jnp.float32).at[
        RES // 2:RES // 2 + RES // 8, :].set(1e-3)

    for name, w in [("pool_fused_dense", dense),
                    ("pool_fused_third_wet", third),
                    ("pool_fused_basin", basin)]:
        def body(k, w=w):
            p, d = PP.pool_automata_pallas_pair_fused(
                h + _eps(k), w, iterations=10, drain_particles=True,
                block=128, phases_per_launch=4, unroll=True)
            return p.sum() + d.sum()
        try:
            print(f"{name}: {_time_chained(body, reps=8):.3f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {e}"[:200], flush=True)

    # --- 3. flagship arrays vs planes ------------------------------------
    import time

    from bench import _measure_rtt
    from noize_tpu.app.flagship import make_tile_step, default_meta
    from noize_tpu.erosion.params import ErosionSettings

    meta = default_meta(RES, 16)
    settings = ErosionSettings()
    K = 8
    for layout in ("arrays", "planes"):
        step, _, _ = make_tile_step(
            meta, settings, octaves=13, blur_iterations=17,
            flow_iterations=8, erosion_cycles=settings.CYCLES,
            emit_mesh=True, mesh_layout=layout)

        @jax.jit
        def chained(key, step=step, layout=layout):
            def body(carry, k):
                out = step(
                    jax.random.uniform(k, (), minval=0, maxval=1000.0),
                    jax.random.uniform(jax.random.fold_in(k, 1), (),
                                       minval=0, maxval=1000.0), k)
                s = out["height"].sum() + out["stream"].sum()
                m = out["mesh"]
                if layout == "planes":
                    s = s + m.planes.sum()
                else:
                    # consume EVERY stream — positions-only lets XLA DCE
                    # the normals/tangents/uvs work (VERDICT r3 weak #3)
                    s = s + (m.positions.sum() + m.normals.sum()
                             + m.tangents.sum() + m.uvs.sum())
                return carry + s, None
            total, _ = jax.lax.scan(body, jnp.float32(0.0),
                                    jax.random.split(key, K))
            return total

        try:
            float(chained(jax.random.PRNGKey(1)))  # warmup/compile
            walls = []
            for seed in (2, 3, 4):
                t0 = time.perf_counter()
                float(chained(jax.random.PRNGKey(seed)))
                walls.append((time.perf_counter() - t0) * 1e3)
            rtt = _measure_rtt()
            ms = max(min(walls) - rtt, min(walls) * 0.5) / K
            print(f"flagship_{layout}: {ms:.2f} ms/step "
                  f"(walls {[round(w,1) for w in walls]}, rtt {rtt:.1f})",
                  flush=True)
        except Exception as e:
            print(f"flagship_{layout}: FAIL {type(e).__name__}: {e}"[:300],
                  flush=True)


if __name__ == "__main__":
    main()
