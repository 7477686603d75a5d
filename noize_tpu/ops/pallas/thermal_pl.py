"""Pallas TPU kernel for thermal (talus) erosion.

All 4·iterations checkerboard phases of ``ops.thermal.thermal_erosion``
fused into ONE launch per row block: the height window is read once,
every phase runs VMEM-resident via the mask/role formulation
(``thermal_phase_masked`` — already Mosaic-safe), and the core block is
written once.  The XLA path pays ~9 shifted-map materializations per
phase in HBM; here they stay in VMEM.

Validity shrinks 2 rows per phase per side (a cell's new value depends on
its 2x2 block, whose anchor lies ≤1 away; the next phase reads ≤1
further), so halo = 2·4·iterations, and global borders are handled by the
phase's own global-coordinate valid mask.  Bit-exact with the XLA path
(tested in interpret mode; the unrolled production body is compared
on-chip via the switch-loop variant, which shares the phase function).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import thermal as _thermal

_F32 = jnp.float32


def _fused_thermal_call(height_pad, res: int, iterations: int, max_diff,
                        increment, block: int, halo: int, unroll: bool):
    nblk = res // block
    w = block + 2 * halo
    n_phases = 4 * iterations

    def kernel(h_hbm, out, h_s, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            h_hbm.at[pl.ds(i * block, w), :], h_s, sem
        )
        cp.start()
        cp.wait()
        row0 = i * block - halo
        md = jnp.float32(max_diff)

        def apply_phase(d, pi):
            x0, z0 = _thermal._PHASE_OFFSETS[pi]
            return _thermal.thermal_phase_masked(
                d, x0, z0, row0, 0, res, md, increment
            )

        d = h_s[:]
        if unroll:
            for p in range(n_phases):
                d = apply_phase(d, p % 4)
        else:
            branches = [
                (lambda pi: lambda dd: apply_phase(dd, pi))(pi)
                for pi in range(4)
            ]

            def body(t, dd):
                return jax.lax.switch(t % 4, branches, dd)

            d = jax.lax.fori_loop(0, n_phases, body, d)

        out[:] = d[halo:halo + block, :]

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
    static_argnames=("talus", "increment_ratio", "height_width_ratio",
                     "iterations", "block", "unroll"),
)
def thermal_erosion_fused(data, talus, increment_ratio, height_width_ratio,
                          iterations: int = 1, block: int = None,
                          unroll: bool = True):
    """ops.thermal.thermal_erosion as one pallas launch (bit-exact).

    ``talus``/``increment_ratio``/``height_width_ratio`` are static (they
    come from frozen stage/settings config) so the phase constants fold
    into the kernel — pallas kernels cannot close over traced scalars."""
    res = data.shape[0]
    halo = max(-(-2 * 4 * iterations // 4) * 4, 4)
    if block is None:
        from .blocks import pick_block

        block = pick_block(res, halo, cols=res)
    assert block >= halo, (block, halo)
    talus_rad = (float(talus) / 90.0) * 3.14159 / 2.0
    # identical op sequence AND implementation to thermal_erosion's
    # max_diff (the backend's own f32 tan — numpy's tanf differs by
    # 1 ulp).  Evaluated at compile time — the operands are static — and
    # baked into the kernel as a constant: an SMEM scalar input breaks
    # under vmap (the batched block spec can't squeeze ANY/SMEM operands),
    # which the tile-batch path exercises.
    with jax.ensure_compile_time_eval():
        max_diff = float(
            (jnp.tan(jnp.float32(talus_rad)) * height_width_ratio) / res)
    from .batching import sequential_vmap

    @sequential_vmap
    def run(d):
        hp = jnp.concatenate(
            [
                jnp.broadcast_to(d[:1, :], (halo,) + d.shape[1:]),
                d,
                jnp.broadcast_to(d[-1:, :], (halo,) + d.shape[1:]),
            ],
            axis=0,
        )
        return _fused_thermal_call(hp, res, iterations, max_diff,
                                   increment_ratio, block, halo, unroll)

    return run(data)
