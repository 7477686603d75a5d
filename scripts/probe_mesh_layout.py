"""Probe: is the mesh phase's 2.5 ms the [N, 3]-minor-dim layout tax?

TPU arrays tile the two minor dims to (8, 128); a (N, 3) f32 stack wastes
~42x of every vector op and write.  Compare the production
heightmap_mesh_overshoot (trailing-dim SoA) against a component-major
formulation ([3, R+1, R+1] planes, minor dims are the vertex grid).
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

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

    def cur_pos(k):
        m = MH.heightmap_mesh_overshoot(h + _eps(k), TILE, RES, 1000.0,
                                        float(TILE))
        return m.positions.sum()

    def cur_all(k):
        m = MH.heightmap_mesh_overshoot(h + _eps(k), TILE, RES, 1000.0,
                                        float(TILE))
        return (m.positions.sum() + m.normals.sum() + m.tangents.sum()
                + m.uvs.sum())

    # component-major: same math, fields kept as [R+1, R+1] planes
    def cm_fields(hh):
        r = TILE
        off = (RES - r) // 2
        t, l, rgt, u, d = MH._tap_slices(hh, r, off)
        step = float(TILE) / r
        height = 1000.0
        vx = jnp.arange(r + 1, dtype=jnp.float32)
        vx_f = jnp.broadcast_to(vx[None, :], (r + 1, r + 1))
        vz_f = jnp.broadcast_to(vx[:, None], (r + 1, r + 1))
        px = jnp.where(vx_f == 0.0, -(0.5 * step), vx_f * step - 0.5)
        py = t * height
        pz = vz_f * step - 0.5
        dx = (rgt - l) * 0.5
        dz = (u - d) * 0.5
        nx = (l - rgt) * 0.5 * MH.NORMAL_STRENGTH
        ny = jnp.full_like(dx, 2.0 / height)
        nz = dz * MH.NORMAL_STRENGTH
        inv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz)
        recip = jnp.float32(1.0) / jnp.float32(r - 0.5)
        return (px, py, pz, nx * inv, ny * inv, nz * inv,
                -4.0 * dx, -4.0 * dz, vx_f * recip, vz_f * recip)

    def cm_pos(k):
        f = cm_fields(h + _eps(k))
        return f[0].sum() + f[1].sum() + f[2].sum()

    def cm_all(k):
        f = cm_fields(h + _eps(k))
        return sum(x.sum() for x in f)

    # stacked component-major on axis 0 (single [10, R+1, R+1] output)
    def cm_stack_all(k):
        f = cm_fields(h + _eps(k))
        return jnp.stack(f, 0).sum()

    # the production MeshPlanes entry point
    def planes_all(k):
        m = MH.heightmap_mesh_overshoot_planes(h + _eps(k), TILE, RES,
                                               1000.0, float(TILE))
        return m.planes.sum()

    for name, fn in [("current_positions_only", cur_pos),
                     ("current_all_fields", cur_all),
                     ("cmajor_positions_only", cm_pos),
                     ("cmajor_all_fields", cm_all),
                     ("cmajor_stacked_all", cm_stack_all),
                     ("meshplanes_entry", planes_all)]:
        ms = _time_chained(fn, reps=8)
        print(f"{name}: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
