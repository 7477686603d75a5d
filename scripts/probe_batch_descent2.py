"""vmap vs lax.map for batched descent: vmapped descent runs every tile
to the slowest tile's trip count (the all-dead early exit is global) and
its per-step cost grows with T (probe_batch_descent: 1.28/2.19/5.28
ms/tile at T=1/4/16).  lax.map restores the per-tile early exit at the
cost of serializing tiles.  Same shapes as probe_batch_descent."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")

from bench import _time_chained
from noize_tpu.erosion import particles as P
from noize_tpu.erosion.params import ErosionSettings
from noize_tpu.erosion.world import WorldState

R = 1024
N = 250
MAXAGE = 32


def main():
    es = ErosionSettings(PARTICLES_PER_CYCLE=N, MAXAGE=MAXAGE,
                         WATER_STEPS=4, CYCLES=1, PILING_RADIUS=8)
    params = es.as_parameters()

    def one(key, height, eps):
        w = WorldState.create(height + eps)
        parts = P.spawn(key, N, R)
        ev = P.descend_all(parts, w, params, 1000.0, 1.0, R,
                           max_steps=MAXAGE)
        return sum(jnp.sum(x) for x in jax.tree.leaves(ev))

    for T in (4, 16):
        ks = jax.random.split(jax.random.PRNGKey(0), T)
        h = jax.random.uniform(jax.random.PRNGKey(1), (T, R, R),
                               jnp.float32)

        def body_map(key):
            eps = 1e-9 * jax.random.uniform(key, ())
            return jax.lax.map(
                lambda kh: one(kh[0], kh[1], eps), (ks, h)).sum()

        ms = _time_chained(body_map, reps=8)
        print(f"T={T:3d} lax.map descent: {ms:8.3f} ms total, "
              f"{ms / T:7.3f} ms/tile", flush=True)


if __name__ == "__main__":
    main()
