"""Pallas TPU kernels for iterated separable stencils.

The Gauss-5 ×17 chain (BASELINE config #2) is HBM-bandwidth bound when run
as 34 XLA passes: every iteration round-trips the full map.  This kernel
tiles the map into VMEM blocks with an iterations-deep halo and runs ALL
iterations locally — one HBM read + one write total.

Correctness contract (tests/test_pallas.py): identical to
``kernels.separable_series`` iterated, including the per-iteration
edge-clamp boundary semantics — interior blocks absorb halo garbage within
the halo budget (contamination advances ``off`` cells per pass), border
blocks re-replicate the true global edge every iteration.

Layout notes (pallas_guide): blocks padded to (8,128) multiples; windows
overlap, so the padded input stays in ANY/HBM and each block DMAs its own
window into VMEM scratch.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fixup(buf, axis, lo_idx: int, hi_idx: int, is_lo, is_hi, size):
    """Re-replicate the true global edge across the halo margin (the
    per-iteration clamp semantics) for blocks on the global border.
    ``lo_idx``/``hi_idx`` are static — use static slices (Mosaic has no
    dynamic_slice lowering on the TC path)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, buf.shape, axis)
    lo_row = jax.lax.slice_in_dim(buf, lo_idx, lo_idx + 1, axis=axis)
    hi_row = jax.lax.slice_in_dim(buf, hi_idx, hi_idx + 1, axis=axis)
    buf = jnp.where(is_lo & (idx < lo_idx), lo_row, buf)
    buf = jnp.where(is_hi & (idx > hi_idx), hi_row, buf)
    return buf


def _conv_axis(buf, taps, axis, flip):
    """Edge-clamped correlation along ``axis`` over the full buffer (edge
    effects stay inside the halo margin)."""
    n = buf.shape[axis]
    k = len(taps)
    off = (k - 1) // 2
    first = jax.lax.slice_in_dim(buf, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(buf, n - 1, n, axis=axis)
    reps = [1, 1]
    reps[axis] = off
    ext = jax.lax.concatenate(
        [jnp.tile(first, reps), buf, jnp.tile(last, reps)], dimension=axis
    )
    out = None
    for i in range(k):
        tap = taps[i] if not flip else taps[k - 1 - i]
        piece = jax.lax.slice_in_dim(ext, i, i + n, axis=axis) * tap
        out = piece if out is None else out + piece
    return out


def fused_separable_chain(x, taps, iterations: int, block: int = 256):
    """``iterations`` repeats of (X-pass, flipped Z-pass) — i.e.
    ``kernels.separable_series`` iterated — in one pallas kernel.

    ``x``: f32[R, R] with R divisible by ``block`` (callers pad);
    ``taps``: static 1-D float sequence.
    """
    taps = tuple(float(t) for t in np.asarray(taps))
    k = len(taps)
    off = (k - 1) // 2
    # X passes contaminate off columns per iteration from the buffer edge,
    # Z passes off rows; contamination does not cross axes, so the halo
    # budget per axis is off · iterations.
    halo = off * iterations
    r = x.shape[0]
    if r % block:
        raise ValueError(f"resolution {r} not divisible by block {block}")
    nblk = r // block
    # halo rounded up to lane/sublane friendly size
    pad = ((halo + 127) // 128) * 128
    w = block + 2 * pad

    xp = jnp.pad(x, ((pad, pad), (pad, pad)), mode="edge")

    def kernel(x_hbm, o_ref, scratch, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * block, w), pl.ds(j * block, w)], scratch, sem
        )
        cp.start()
        cp.wait()
        buf = scratch[:]
        is_top = i == 0
        is_bot = i == nblk - 1
        is_left = j == 0
        is_right = j == nblk - 1
        # true global edges in local coords
        lo = pad
        hi = pad + block - 1
        for it in range(iterations):
            if it > 0:
                buf = _fixup(buf, 0, lo, hi, is_top, is_bot, w)
                buf = _fixup(buf, 1, lo, hi, is_left, is_right, w)
            buf = _conv_axis(buf, taps, 1, flip=False)   # X pass
            buf = _conv_axis(buf, taps, 0, flip=True)    # Z pass (flipped)
        o_ref[:] = jax.lax.slice(buf, (pad, pad), (pad + block, pad + block))

    out = pl.pallas_call(
        kernel,
        grid=(nblk, nblk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (block, block), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r, r), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((w, w), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp)
    return out


def _rows_plan(r: int, cols: int, off: int, ipl: int):
    """(block, iterations_per_launch) for the row chain: the per-launch
    halo is off·ipl rows, and block ≥ halo is a boundary-correctness
    requirement (blocks.pick_block).  When wide taps × a wide field leave
    no candidate under the VMEM window cap, HALVE the launch depth — the
    halo shrinks with it — instead of failing; ipl=1 always admits a block
    for any 8-divisible row count (halo ≤ 16 with the widest blur taps)."""
    from .blocks import pick_block

    while True:
        halo = ((off * ipl + 7) // 8) * 8
        try:
            # the conv holds only a few live (w, cols) buffers — allow
            # bigger windows than the default cap so halo overhead stays
            # small
            return pick_block(r, halo, cols=cols,
                              cap_bytes=12 * 1024 * 1024), ipl
        except ValueError:
            if ipl == 1:
                raise
            ipl = (ipl + 1) // 2


def fused_separable_chain_rows(x, taps, iterations: int, block: int = None,
                               iterations_per_launch: int = 6):
    """``iterations`` repeats of (X-pass, flipped Z-pass) over FULL-WIDTH
    row blocks — the production variant of :func:`fused_separable_chain`.

    The 2-D-block version pads its halo up to a 128-lane multiple on BOTH
    axes (a (256+2·128)² window = 4× the block's area in DMA and conv
    compute).  Full-width row blocks eliminate the column halo entirely:
    every X pass sees the true global columns, so only the Z passes need
    a halo (off·iterations rows, rounded to the 8-row sublane tiling) and
    only top/bottom blocks re-replicate the global edge per iteration.

    ``iterations_per_launch``: Mosaic compile time grows super-linearly
    with the unrolled iteration count (a 17-iteration monolithic body
    took 22 min at 4096²); chunking ~6 iterations per launch keeps the
    compile tractable, costs one extra HBM round trip per chunk, and the
    per-launch halo shrinks to off·chunk.  Chained chunks reproduce the
    per-iteration clamp semantics exactly (each launch re-pads from the
    true border)."""
    off0 = (len(np.asarray(taps)) - 1) // 2
    if block is None:
        block, iterations_per_launch = _rows_plan(
            x.shape[0], x.shape[1], off0,
            min(iterations, iterations_per_launch))
    if iterations > iterations_per_launch:
        done = 0
        while done < iterations:
            step_n = min(iterations_per_launch, iterations - done)
            x = fused_separable_chain_rows(
                x, taps, step_n, block=block,
                iterations_per_launch=iterations_per_launch)
            done += step_n
        return x
    taps = tuple(float(t) for t in np.asarray(taps))
    k = len(taps)
    off = (k - 1) // 2
    halo = ((off * iterations + 7) // 8) * 8
    r, cols = x.shape
    if r % block:
        raise ValueError(f"resolution {r} not divisible by block {block}")
    if block < halo:
        raise ValueError(
            f"row block {block} < halo {halo}: interior blocks would read "
            "statically edge-replicated padding without the per-iteration "
            "clamp fixup (wrong borders); raise block or lower "
            "iterations_per_launch")
    nblk = r // block
    w = block + 2 * halo

    xp = jnp.concatenate(
        [
            jnp.broadcast_to(x[:1, :], (halo, cols)),
            x,
            jnp.broadcast_to(x[-1:, :], (halo, cols)),
        ],
        axis=0,
    )

    def kernel(x_hbm, o_ref, scratch, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * block, w), :], scratch, sem
        )
        cp.start()
        cp.wait()
        buf = scratch[:]
        is_top = i == 0
        is_bot = i == nblk - 1
        lo = halo
        hi = halo + block - 1
        for it in range(iterations):
            if it > 0:
                # Z-pass clamp semantics: global-border blocks track the
                # true edge row across the halo margin each iteration
                buf = _fixup(buf, 0, lo, hi, is_top, is_bot, w)
            buf = _conv_axis(buf, taps, 1, flip=False)   # X pass (exact)
            buf = _conv_axis(buf, taps, 0, flip=True)    # Z pass (flipped)
        o_ref[:] = buf[halo:halo + block, :]

    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (block, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r, cols), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((w, cols), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xp)


def gauss_chain(x, width: int, sigma: float, iterations: int,
                block: int = None, interpret: bool = False):
    """Convenience wrapper matching StageGaussianBlur's iterated blur
    (row-block fused kernel)."""
    from ..kernels import gaussian_taps
    from ..blur import limit_width, sigma_value

    width = limit_width(width)
    taps = gaussian_taps(sigma_value(sigma), width)
    if interpret:
        return _interpret_chain(x, taps, iterations, block)
    return fused_separable_chain_rows(x, taps, iterations, block)


def _interpret_chain(x, taps, iterations, block):
    with pltpu.force_tpu_interpret_mode():
        return fused_separable_chain_rows(x, taps, iterations, block)
