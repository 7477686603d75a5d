"""Spatially-sharded (sp) versions of the field ops: noise, separable
filters, flow map — one logical grid split over a 2-D device mesh with ICI
halo exchange.

Parity contract: each op here equals its single-device counterpart in
noize_tpu.ops bit-for-bit up to float reassociation (edge-replicated halos
reproduce the clamped-index boundary semantics) — tests/test_parallel.py
checks them against the local ops on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import kernels as _k
from ..ops import flow as _f
from ..ops.fractal import noise_value
from .halo import exchange_2d, shard_map, _crop


def sharded_fractal(mesh: Mesh, resolution: int, xpos, zpos, **kw):
    """Fractal noise over a sharded (resolution²) grid.

    Noise is pure position math — each shard evaluates its own world-space
    window; no communication.  Equals ops.fractal exactly.
    """
    spec = P("x", "y")
    nx, ny = mesh.shape["x"], mesh.shape["y"]
    local_r = resolution // nx
    local_c = resolution // ny

    @partial(shard_map, mesh=mesh, in_specs=(), out_specs=spec, check_vma=False)
    def gen():
        ix = lax.axis_index("x")
        iy = lax.axis_index("y")
        # local window origin in the global tile; world offset adds on top
        row0 = ix * local_r
        col0 = iy * local_c
        col = lax.broadcasted_iota(jnp.float32, (local_r, local_c), 1) + col0
        row = lax.broadcasted_iota(jnp.float32, (local_r, local_c), 0) + row0
        inv = 1.0 / jnp.float32(kw.get("noise_size", 1000.0))
        xi = (col + xpos) * inv
        zi = (row + zpos) * inv
        g = jnp.exp2(-jnp.float32(kw.get("hurst", 0.0)))
        t = jnp.zeros((local_r, local_c), jnp.float32)
        f = jnp.float32(1.0)
        a = jnp.float32(kw.get("starting_amplitude", 1.0))
        detune = jnp.float32(0.0)
        stepdown = jnp.float32(kw.get("stepdown", 2.0))
        detune_rate = jnp.float32(kw.get("detune_rate", 0.0))
        octaves = kw.get("octaves", 1)
        kind = kw.get("noise_type", "Perlin")
        for _ in range(octaves):
            t = t + a * noise_value(kind, f * xi, f * zi)
            detune = detune + detune_rate
            f = f * (stepdown - detune)
            a = a * g
        norm = jnp.float32(0.0)
        amp = jnp.float32(1.0)
        for _ in range(octaves):
            norm = norm + amp
            amp = amp * g
        return t / norm

    return gen()


def sharded_kernel_filter(mesh: Mesh, data, filter_type: str, iterations: int = 1):
    """kernel_filter over a sharded field: one halo exchange per iteration
    (halo = taps//2 per pass; both X and Z passes covered by a 2-D halo)."""
    if filter_type == "Sobel3_2D":
        halo = 1
        local = _k.sobel2d
    else:
        tx, tz, factor = _k._SERIES_TABLE[filter_type]
        halo = (len(tx) - 1) // 2
        local = lambda a: _k.separable_series(a, tx, tz, factor)
    spec = P("x", "y")

    @partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False)
    def one(block):
        ext = exchange_2d(block, halo)
        return _crop(local(ext), halo)

    for _ in range(iterations):
        data = one(data)
    return data


def sharded_gauss_blur(mesh: Mesh, data, width: int, sigma, iterations: int = 1):
    from ..ops import blur as _b

    width = _b.limit_width(width)
    taps = _b.gaussian_taps(_b.sigma_value(sigma), width)
    halo = (width - 1) // 2
    spec = P("x", "y")

    @partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False)
    def one(block):
        ext = exchange_2d(block, halo)
        return _crop(_k.separable_series(ext, taps, taps, 1.0), halo)

    for _ in range(iterations):
        data = one(data)
    return data


def sharded_thermal_erosion(mesh: Mesh, data, talus, increment_ratio,
                            height_width_ratio, iterations: int = 1):
    """thermal_erosion over a sharded field: the mask/role phase variant
    (ops.thermal.thermal_phase_masked) on halo-1 extended shards, one
    exchange per phase.  Matches the single-device op exactly."""
    from ..ops import thermal as _t

    res = data.shape[0]
    nx, ny = mesh.shape["x"], mesh.shape["y"]
    local_r = res // nx
    local_c = res // ny
    talus_rad = (talus / 90.0) * 3.14159 / 2.0
    spec = P("x", "y")

    @partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False)
    def run(block):
        max_diff = (jnp.tan(jnp.float32(talus_rad)) * height_width_ratio) / res
        row0 = lax.axis_index("x") * local_r - 1
        col0 = lax.axis_index("y") * local_c - 1

        def one_iter(_, b):
            for (x0, z0) in _t._PHASE_OFFSETS:
                ext = exchange_2d(b, 1)
                ext = _t.thermal_phase_masked(
                    ext, x0, z0, row0, col0, res, max_diff, increment_ratio
                )
                b = _crop(ext, 1)
            return b

        return lax.fori_loop(0, iterations, one_iter, block)

    return run(data)


def sharded_flow_map(mesh: Mesh, height, iterations: int = 5,
                     norm_min=-0.1, norm_max=0.1):
    """flow_map over a sharded field: width-1 halo exchanged per relaxation
    step inside the scan (flows + water + static height)."""
    spec = P("x", "y")

    @partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False)
    def run(hblock):
        shape = hblock.shape
        water = jnp.full(shape, _f.WATER_INIT, jnp.float32)
        zeros = jnp.zeros(shape, jnp.float32)
        h_ext = exchange_2d(hblock, 1)

        def step(carry, _):
            water, fw, fe, fs, fn = carry
            w_ext = exchange_2d(water, 1)
            fw_e = exchange_2d(fw, 1)
            fe_e = exchange_2d(fe, 1)
            fs_e = exchange_2d(fs, 1)
            fn_e = exchange_2d(fn, 1)
            nfw, nfe, nfs, nfn = _f.compute_flow_step(h_ext, w_ext, fw_e, fe_e, fs_e, fn_e)
            nfw, nfe, nfs, nfn = (_crop(a, 1) for a in (nfw, nfe, nfs, nfn))
            nfw_e = exchange_2d(nfw, 1)
            nfe_e = exchange_2d(nfe, 1)
            nfs_e = exchange_2d(nfs, 1)
            nfn_e = exchange_2d(nfn, 1)
            water = _crop(_f.update_water_step(w_ext, nfw_e, nfe_e, nfs_e, nfn_e), 1)
            return (water, nfw, nfe, nfs, nfn), None

        (water, fw, fe, fs, fn), _ = lax.scan(
            step, (water, zeros, zeros, zeros, zeros), None, length=iterations
        )
        v = _crop(
            _f.velocity_field(
                exchange_2d(fw, 1), exchange_2d(fe, 1),
                exchange_2d(fs, 1), exchange_2d(fn, 1),
            ),
            1,
        )
        rng = norm_max - norm_min
        v = jnp.where(rng < 1e-12, 0.0, v)
        return (v - norm_min) / rng

    return run(height)
