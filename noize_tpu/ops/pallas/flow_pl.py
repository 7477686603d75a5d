"""Pallas TPU kernel for flow-map relaxation iterations.

One pallas_call per (flow step + water step) iteration over full-width row
blocks with an aligned halo: the six maps are read once and the five
evolving maps written once per iteration, instead of XLA's dozens of HBM
round trips.

Boundary exactness: inputs are edge-padded; a padded ghost row receives the
same arithmetic as the border row it replicates (its own neighbors are
replicas too), so ghost values equal border values *exactly* through both
sub-steps — identical to the clamped-index semantics of ops.flow.  Tested
against the XLA path in interpret mode and on-chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import flow as _flow

_F32 = jnp.float32
_HALO = 8  # correctness needs 2 (one per sub-step); 8 keeps DMA rows aligned


def _iteration_call(height_pad, water, fw, fe, fs, fn, res: int, block: int):
    nblk = res // block
    w = block + 2 * _HALO

    def kernel(h_hbm, w_hbm, fw_hbm, fe_hbm, fs_hbm, fn_hbm,
               wo, fwo, feo, fso, fno, scratch, sem):
        i = pl.program_id(0)

        def dma(src, slot):
            cp = pltpu.make_async_copy(
                src.at[pl.ds(i * block, w), :], scratch.at[slot], sem
            )
            cp.start()
            cp.wait()

        for slot, src in enumerate((h_hbm, w_hbm, fw_hbm, fe_hbm, fs_hbm, fn_hbm)):
            dma(src, slot)
        h = scratch[0]
        wtr = scratch[1]
        nfw, nfe, nfs, nfn = _flow.compute_flow_step(
            h, wtr, scratch[2], scratch[3], scratch[4], scratch[5]
        )
        # Global-border blocks: the water step reads the flows at clamped
        # indices; re-replicate the true border row across the ghost margin
        # so those reads alias the border's freshly computed flows (ghost
        # flows diverge after the first sub-step — their own up/down diffs
        # are zero by construction).
        is_top = i == 0
        is_bot = i == nblk - 1
        row = jax.lax.broadcasted_iota(jnp.int32, (w, res), 0)
        lo = _HALO
        hi = _HALO + block - 1

        def reclamp(a):
            a = jnp.where(is_top & (row < lo), a[lo:lo + 1, :], a)
            a = jnp.where(is_bot & (row > hi), a[hi:hi + 1, :], a)
            return a

        nfw, nfe, nfs, nfn = (reclamp(a) for a in (nfw, nfe, nfs, nfn))
        nw = _flow.update_water_step(wtr, nfw, nfe, nfs, nfn)
        sl = slice(_HALO, _HALO + block)
        wo[:] = nw[sl, :]
        fwo[:] = nfw[sl, :]
        feo[:] = nfe[sl, :]
        fso[:] = nfs[sl, :]
        fno[:] = nfn[sl, :]

    out_spec = pl.BlockSpec((block, res), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=(out_spec,) * 5,
        out_shape=tuple(
            jax.ShapeDtypeStruct((res, res), _F32) for _ in range(5)
        ),
        scratch_shapes=[
            pltpu.VMEM((6, w, res), _F32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(height_pad, water, fw, fe, fs, fn)
    return outs


def _fused_flow_call(height_pad, res: int, iterations: int, norm_min,
                     norm_max, block: int, halo: int):
    """ONE launch for the whole flow map: water/flows initialized in-kernel,
    ``iterations`` relaxation iterations + velocity + normalize all
    VMEM-resident per row block — the only HBM traffic is one height
    window in and one velocity block out.

    Validity shrinks 2 rows per iteration per side (+1 for the velocity
    stencil), so ``halo`` ≥ 2·iterations + 1; global-border blocks instead
    re-replicate the border row across the ghost margin after each
    sub-step, reproducing the clamped-index reads exactly (see
    _iteration_call's boundary note)."""
    nblk = res // block
    w = block + 2 * halo
    rng_ = norm_max - norm_min

    def kernel(h_hbm, vo, h_s, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            h_hbm.at[pl.ds(i * block, w), :], h_s, sem
        )
        cp.start()
        cp.wait()
        h = h_s[:]

        is_top = i == 0
        is_bot = i == nblk - 1
        row = jax.lax.broadcasted_iota(jnp.int32, (w, res), 0)
        lo = halo
        hi = halo + block - 1

        def reclamp(a):
            a = jnp.where(is_top & (row < lo), a[lo:lo + 1, :], a)
            a = jnp.where(is_bot & (row > hi), a[hi:hi + 1, :], a)
            return a

        wtr = jnp.full((w, res), _flow.WATER_INIT, _F32)
        fw = fe = fs = fn = jnp.zeros((w, res), _F32)
        for _ in range(iterations):
            fw, fe, fs, fn = _flow.compute_flow_step(h, wtr, fw, fe, fs, fn)
            fw, fe, fs, fn = (reclamp(a) for a in (fw, fe, fs, fn))
            wtr = reclamp(_flow.update_water_step(wtr, fw, fe, fs, fn))

        v = _flow.velocity_field(fw, fe, fs, fn)
        v = jnp.where(rng_ < 1e-12, jnp.zeros_like(v), v)
        v = (v - norm_min) / rng_
        vo[:] = v[lo:lo + block, :]

    out_spec = pl.BlockSpec((block, res), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((res, res), _F32),
        scratch_shapes=[
            pltpu.VMEM((w, res), _F32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(height_pad)


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "block", "norm_min", "norm_max"),
)
def flow_map_fused(height, iterations: int = 5, norm_min=-0.1,
                   norm_max=0.1, block: int = None):
    """ops.flow.flow_map as ONE pallas launch (bit-exact; tested).

    The XLA scan pays a large fixed cost (~8 ms at 2048² regardless of
    iteration count — see bench_results phase table); here height is read
    once, everything iterates in VMEM, and one velocity map comes back."""
    res = height.shape[0]
    halo = max(-(-(2 * iterations + 1) // 4) * 4, 4)
    if block is None:
        from .blocks import pick_block

        block = pick_block(res, halo, cols=res)
    assert block >= halo, (block, halo)
    from .batching import sequential_vmap

    @sequential_vmap
    def run(h):
        hp = jnp.concatenate(
            [
                jnp.broadcast_to(h[:1, :], (halo,) + h.shape[1:]),
                h,
                jnp.broadcast_to(h[-1:, :], (halo,) + h.shape[1:]),
            ],
            axis=0,
        )
        return _fused_flow_call(hp, res, iterations, norm_min, norm_max,
                                block, halo)

    return run(height)


def _pad(a):
    return jnp.concatenate(
        [
            jnp.broadcast_to(a[:1, :], (_HALO,) + a.shape[1:]),
            a,
            jnp.broadcast_to(a[-1:, :], (_HALO,) + a.shape[1:]),
        ],
        axis=0,
    )


@functools.partial(jax.jit, static_argnames=("iterations", "block"))
def flow_map_pallas(height, iterations: int = 5, norm_min=-0.1, norm_max=0.1,
                    block: int = 512):
    """ops.flow.flow_map with pallas iteration kernels (res % block == 0)."""
    res = height.shape[0]
    height_pad = _pad(height)
    water = jnp.full((res, res), _flow.WATER_INIT, _F32)
    zeros = jnp.zeros((res, res), _F32)

    def step(carry, _):
        water, fw, fe, fs, fn = carry
        water, fw, fe, fs, fn = _iteration_call(
            height_pad, _pad(water), _pad(fw), _pad(fe), _pad(fs), _pad(fn),
            res, block,
        )
        return (water, fw, fe, fs, fn), None

    (water, fw, fe, fs, fn), _ = jax.lax.scan(
        step, (water, zeros, zeros, zeros, zeros), None, length=iterations
    )
    v = _flow.velocity_field(fw, fe, fs, fn)
    rng = norm_max - norm_min
    v = jnp.where(rng < 1e-12, 0.0, v)
    return (v - norm_min) / rng
