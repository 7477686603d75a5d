"""Is the batched erosion increment descent-bound?  probe_batch_phase
attributed 1.5-3.4 ms/tile of batch degradation to the erosion stage;
this times vmapped descend_all alone at T in {1, 4, 16} (config-5
erosion shape: 250 particles, MAXAGE 32, 1024^2) to attribute it.
"""
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
    for T in (1, 4, 16):
        ks = jax.random.split(jax.random.PRNGKey(0), T)
        h = jax.random.uniform(jax.random.PRNGKey(1), (T, R, R),
                               jnp.float32)

        def one(key, height, eps):
            w = WorldState(
                height=height + eps,
                flow=jnp.zeros_like(height),
                pool=jnp.zeros_like(height),
                track=jnp.zeros_like(height),
                plants=jnp.zeros_like(height),
            )
            parts = P.spawn(key, N, R)
            ev = P.descend_all(parts, w, params, 1000.0, 1.0, R,
                               max_steps=MAXAGE)
            return sum(jnp.sum(x) for x in jax.tree.leaves(ev))

        def body(key):
            eps = 1e-9 * jax.random.uniform(key, ())
            return jax.vmap(one, in_axes=(0, 0, None))(ks, h, eps).sum()

        ms = _time_chained(body, reps=8)
        print(f"T={T:3d} descent x{MAXAGE} {N}p: {ms:8.3f} ms total, "
              f"{ms / T:7.3f} ms/tile", flush=True)


if __name__ == "__main__":
    main()
