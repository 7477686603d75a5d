"""sp erosion on REAL TPU hardware, 1x1 mesh: the shard_map cycle program
(halo exchange, psum event merge, per-shard pool phases) has only ever
compiled on CPU meshes; this verifies it compiles + runs on the chip."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/noize_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np
from noize_tpu.core.tiles import TileSetMeta
from noize_tpu.erosion.params import ErosionSettings
from noize_tpu.parallel import device_mesh as DM
from noize_tpu.parallel.sharded_erosion import ShardedErosionSim
from noize_tpu.ops.fractal import fractal

res = 1024
h = jax.block_until_ready(jax.jit(
    lambda: fractal(res, 0, 0, noise_type="Simplex", octaves=13,
                    hurst=0.4, noise_size=1700.0))())
mesh = DM.spatial_mesh()
es = ErosionSettings()
sim = ShardedErosionSim(mesh, np.asarray(h), settings=es, seed=3)
t0 = time.time()
sim.step()
first = time.time() - t0
t0 = time.time()
sim.step()
w2 = (time.time() - t0) * 1e3
hm = np.asarray(sim.height_map)
print(json.dumps({"probe": "sharded_erosion_tpu_1x1_1024",
                  "mesh_shape": {k: int(v) for k, v in mesh.shape.items()},
                  "ok": bool(np.isfinite(hm).all()),
                  "first_step_s": round(first, 1),
                  "warm_step_ms": round(w2, 1)}))
