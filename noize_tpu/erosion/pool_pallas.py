"""Pallas TPU kernel for pool-automata phases.

The XLA half-row formulation still round-trips HBM ~dozens of times per
phase (measured ~1.2ms/phase at 2048²).  This kernel runs one phase per
pallas_call over full-width row blocks with a 1-row halo, VMEM-resident:
per phase the map is read once and written once.

Shares the exact phase semantics with erosion.pool._spread_phase (masks,
sorted neighbor walk, border self-aliasing) — the kernel calls the same
function on its window with global-coordinate masks/border maps;
equivalence is tested against the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pool as _pool

_F32 = jnp.float32


def _phase_call(height_pad, pool_pad, xoff: int, zoff: int,
                drain_particles: bool, res: int, block: int):
    """One phase over the padded (res+2, res) maps → (new_pool, drains)."""
    nblk = res // block
    # 4-row halo each side: correctness needs 2 (core deltas come from
    # 1-out givers whose neighbor walk reaches 2 out); 4 keeps the DMA
    # window (block+8) aligned to the (8, 128) f32 tiling
    w = block + 8

    def kernel(h_hbm, p_hbm, pool_o, drain_o, h_s, p_s, sem):
        i = pl.program_id(0)
        cp1 = pltpu.make_async_copy(
            h_hbm.at[pl.ds(i * block, w), :], h_s, sem
        )
        cp1.start()
        cp1.wait()
        cp2 = pltpu.make_async_copy(
            p_hbm.at[pl.ds(i * block, w), :], p_s, sem
        )
        cp2.start()
        cp2.wait()
        # global coords of the window rows: padded row r ↔ global r - 1
        grow = (
            jax.lax.broadcasted_iota(jnp.int32, (w, res), 0)
            + i * block - 4
        )
        gcol = jax.lax.broadcasted_iota(jnp.int32, (w, res), 1)
        mask = _pool._phase_mask_from_coords(grow, gcol, xoff, zoff)
        mask = mask & (grow >= 0) & (grow < res)  # pad rows are ghosts
        border = _pool._border_maps((w, res), grow, gcol, res)
        new_p, dm = _pool._spread_phase(
            h_s[:], p_s[:], mask, drain_particles, border=border
        )
        pool_o[:] = new_p[4:block + 4, :]
        drain_o[:] = dm[4:block + 4, :]

    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((block, res), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, res), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((res, res), _F32),
            jax.ShapeDtypeStruct((res, res), _F32),
        ),
        scratch_shapes=[
            pltpu.VMEM((w, res), _F32),
            pltpu.VMEM((w, res), _F32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(height_pad, pool_pad)


def _phase_pair_call(h_a, h_c, p_a, p_c, xoff: int, zoff: int,
                     drain_particles: bool, res: int, block: int):
    """One phase on the (active, complement) half-row lattices via pallas.

    Lattice arrays are (res/2, res); windows carry a 4-row halo (aligned;
    correctness needs 1 lattice row = 2 global rows on each side).  The
    pair layout halves the elementwise work vs the full-grid kernel.
    Inputs are pre-padded by 4 rows (edge mode).  Returns
    (new_active, new_comp, drain_active, drain_comp)."""
    r2 = res // 2
    nblk = r2 // block
    hw = block + 8

    def kernel(ha_hbm, hc_hbm, pa_hbm, pc_hbm,
               pa_o, pc_o, da_o, dc_o, ha_s, hc_s, pa_s, pc_s, sem):
        i = pl.program_id(0)

        for src, dst in ((ha_hbm, ha_s), (hc_hbm, hc_s),
                         (pa_hbm, pa_s), (pc_hbm, pc_s)):
            cp = pltpu.make_async_copy(
                src.at[pl.ds(i * block, hw), :], dst, sem
            )
            cp.start()
            cp.wait()

        # _phase_pair derives masks/borders from the GLOBAL lattice row:
        # window row k ↔ lattice row i·block − 4 + k (inputs pre-padded by
        # 4 edge rows, so padded row p ↔ lattice row p − 4)
        new_a, new_c, da, dc = _pool._phase_pair(
            ha_s[:], hc_s[:], pa_s[:], pc_s[:],
            xoff, zoff, drain_particles, res, row0=i * block - 4,
        )
        sl = slice(4, 4 + block)
        pa_o[:] = new_a[sl, :]
        pc_o[:] = new_c[sl, :]
        da_o[:] = da[sl, :]
        dc_o[:] = dc[sl, :]

    out_spec = pl.BlockSpec((block, res), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(out_spec,) * 4,
        out_shape=tuple(
            jax.ShapeDtypeStruct((r2, res), _F32) for _ in range(4)
        ),
        scratch_shapes=[
            pltpu.VMEM((hw, res), _F32),
            pltpu.VMEM((hw, res), _F32),
            pltpu.VMEM((hw, res), _F32),
            pltpu.VMEM((hw, res), _F32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(h_a, h_c, p_a, p_c)


def _pad4(a):
    return jnp.concatenate(
        [
            jnp.broadcast_to(a[:1, :], (4,) + a.shape[1:]),
            a,
            jnp.broadcast_to(a[-1:, :], (4,) + a.shape[1:]),
        ],
        axis=0,
    )


@functools.partial(
    jax.jit, static_argnames=("iterations", "drain_particles", "block")
)
def pool_automata_pallas_pair(height, pool, iterations: int = 10,
                              drain_particles: bool = True,
                              block: int = None):
    """Half-row-pair pallas pool automata: split even/odd rows once, run
    every phase as a pair-lattice kernel, join once.

    ``block``: rows of the half-row lattice per grid step; None picks the
    largest of 256/128/64/32/16/8 dividing res/2 (measured on v5e at
    2048²: 256 → 16.5 ms, 128 → 21 ms, 64 → 17.7 ms per ×10 call; 512
    exceeds the 100 MB scoped-VMEM limit)."""
    res = height.shape[0]
    if block is None:
        from ..ops.pallas.blocks import pick_block

        block = pick_block(res // 2, 4, cols=res)
    h_e, h_o = _pool._halfrow_views(height, 0)
    p_e, p_o = _pool._halfrow_views(pool, 0)
    hpe, hpo = _pad4(h_e), _pad4(h_o)
    d_e = jnp.zeros_like(p_e)
    d_o = jnp.zeros_like(p_o)

    def make_branch(xo, zo):
        if zo == 0:
            def br(c):
                p_e, p_o, d_e, d_o = c
                na, nc, da, dc = _phase_pair_call(
                    hpe, hpo, _pad4(p_e), _pad4(p_o), xo, 0,
                    drain_particles, res, block)
                return na, nc, d_e + da, d_o + dc
        else:
            def br(c):
                p_e, p_o, d_e, d_o = c
                na, nc, da, dc = _phase_pair_call(
                    hpo, hpe, _pad4(p_o), _pad4(p_e), xo, 1,
                    drain_particles, res, block)
                return nc, na, d_e + dc, d_o + da
        return br

    branches = [make_branch(xo, zo) for xo in (0, 1) for zo in (0, 1)]

    def step(carry, t):
        has_water = jnp.any(carry[0] > 0.0) | jnp.any(carry[1] > 0.0)
        out = jax.lax.cond(
            has_water,
            lambda c: jax.lax.switch(t % 4, branches, c),
            lambda c: c,
            carry,
        )
        return out, None

    (p_e, p_o, d_e, d_o), _ = jax.lax.scan(
        step, (p_e, p_o, d_e, d_o),
        jnp.arange(4 * iterations, dtype=jnp.int32),
    )
    return (
        _pool._halfrow_join(p_e, p_o, 0),
        _pool._halfrow_join(d_e, d_o, 0),
    )


def _fused_quad_call(h_pads, p_pads, d_pads, phase_seq, drain_particles: bool,
                     res: int, block: int, halo: int, unroll: bool):
    """One launch: run ``phase_seq`` (a static tuple of (xoff, zoff)) over
    the four pool quads with the whole phase chain VMEM-resident per row
    block.

    Inputs are quad arrays (res/2, res/2) pre-padded by ``halo`` rows (edge
    mode).  Validity shrinks 2 rows per phase per side, so ``halo`` must be
    ≥ 2·len(phase_seq); the core block written out is exact.  Per launch
    the 12 windows are DMA'd ONCE — vs once per phase in the pair kernel —
    and all inter-phase traffic stays in VMEM.

    ``unroll``: emit the phases as a static in-kernel sequence (no Mosaic
    control flow) vs a fori_loop + lax.switch over 4 single-phase branches
    (smaller kernel body)."""
    r2 = res // 2
    q = res // 2
    nblk = r2 // block
    w = block + 2 * halo
    phase0 = _pool._PHASE_ORDER.index(phase_seq[0])

    def kernel(*refs):
        h_refs = refs[:4]
        p_refs = refs[4:8]
        d_refs = refs[8:12]
        outs = refs[12:20]
        scratch = refs[20:32]
        sems = refs[32:44]
        i = pl.program_id(0)

        # start all 12 copies before waiting on any — overlapped transfers
        copies = [
            pltpu.make_async_copy(src.at[pl.ds(i * block, w), :], dst, sem)
            for src, dst, sem in zip(h_refs + p_refs + d_refs, scratch,
                                     sems)
        ]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

        row0 = i * block - halo
        h_quads = {kk: scratch[n][:] for n, kk in enumerate(_pool._QKEYS)}

        def apply_phase(c, xo, zo):
            p_quads = dict(zip(_pool._QKEYS, c[:4]))
            d_quads = dict(zip(_pool._QKEYS, c[4:]))
            new_p, dr = _pool._quad_phase_step(
                h_quads, p_quads, xo, zo, drain_particles, res, row0=row0,
            )
            return tuple(new_p[kk] for kk in _pool._QKEYS) + tuple(
                d_quads[kk] + dr[kk] for kk in _pool._QKEYS
            )

        # drains carry the ACCUMULATED map so the per-phase running sum
        # keeps the pair path's exact f32 add order across launches
        carry = tuple(scratch[4 + n][:] for n in range(8))
        if unroll:
            for xo, zo in phase_seq:
                carry = apply_phase(carry, xo, zo)
            final = carry
        else:
            branches = [
                (lambda xo, zo: lambda c: apply_phase(c, xo, zo))(xo, zo)
                for xo, zo in _pool._PHASE_ORDER
            ]

            def body(t, c):
                return jax.lax.switch((t + phase0) % 4, branches, c)

            final = jax.lax.fori_loop(0, len(phase_seq), body, carry)

        sl = slice(halo, halo + block)
        for n in range(8):
            outs[n][:] = final[n][sl, :]

    out_spec = pl.BlockSpec((block, q), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 12,
        out_specs=(out_spec,) * 8,
        out_shape=tuple(
            jax.ShapeDtypeStruct((r2, q), _F32) for _ in range(8)
        ),
        scratch_shapes=[pltpu.VMEM((w, q), _F32) for _ in range(12)]
        + [pltpu.SemaphoreType.DMA] * 12,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*h_pads, *p_pads, *d_pads)
    return outs[:4], outs[4:]


def _fused_pair_call(h_e_pad, h_o_pad, p_e_pad, p_o_pad, d_e_pad, d_o_pad,
                     phase_seq, drain_particles: bool, res: int,
                     block: int, halo: int, unroll: bool):
    """One launch: run ``phase_seq`` phases on the half-row pair lattices
    with the whole chain VMEM-resident per row block — the pair kernel's
    proven compute profile with the per-phase DMA paid once per launch.

    All six inputs are (res/2 + 2·halo, res), edge-padded (heights once
    per CALL — they never change; carries re-padded per launch, measured
    NEUTRAL vs in-kernel clamped windows — round 4, 7.38 vs 7.51 at
    ppl4/b128: XLA's pad copies are cheap, and padding buys UNIFORM
    window geometry).  Uniform geometry in turn enables the input
    PREFETCH pipeline: every window buffer is double-buffered (2, w,
    res) and block i+1's six input DMAs are started before block i's
    compute, hiding the input transfer behind the phase chain — the
    exposed per-block input latency was the dominant share of the fitted
    per-launch overhead (Lf = 0.091 ms, BENCH_HISTORY round 4).  Window
    starts are computed in 8-row units (Mosaic's divisibility prover
    accepts ``x * 8`` but not compound index arithmetic).  Validity
    shrinks 2 lattice rows per phase per side, so ``halo`` ≥
    2·len(phase_seq); drain accumulators ride through the kernel to keep
    the XLA path's exact f32 add order.

    Note (round 3, measured): carrying PADDED buffers through the scan
    with manual core-row output DMAs removes the per-launch XLA edge-pad
    copies but LOSES overall (8.0 vs 5.2 ms per ×10 call) — BlockSpec
    VMEM outputs pipeline the write-back with the next block's compute,
    and a trailing in-kernel DMA wait serializes it — hence padded
    inputs with BlockSpec outputs."""
    r2 = res // 2
    nblk = r2 // block
    w = block + 2 * halo
    phase0 = _pool._PHASE_ORDER.index(phase_seq[0])

    def kernel(*refs):
        ins = refs[:6]
        outs = refs[6:10]
        bufs = refs[10:16]      # (2, w, res) double-buffered windows
        sems = refs[16:22]      # DMA semaphore pairs
        i = pl.program_id(0)

        def copies(j, slot):
            # uniform window [j·block, j·block + w) on every padded input;
            # start expressed in 8-row units for the divisibility prover
            jb8 = j * (block // 8)
            return [
                pltpu.make_async_copy(
                    src.at[pl.ds(jb8 * 8, w), :], buf.at[slot],
                    sem.at[slot])
                for src, buf, sem in zip(ins, bufs, sems)
            ]

        if nblk == 1:
            for cp in copies(i, 0):
                cp.start()
            for cp in copies(i, 0):
                cp.wait()
            cur = 0
        else:
            par = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            def start_first():
                for cp in copies(i, par):
                    cp.start()

            def start_next():
                for cp in copies(i + 1, nxt):
                    cp.start()

            # step 0 starts its own windows; every step except the last
            # prefetches block i+1 while block i computes (inputs are
            # launch-immutable, so cross-block prefetch is race-free)
            pl.when(i == 0)(start_first)
            pl.when(i < nblk - 1)(start_next)
            for cp in copies(i, par):
                cp.wait()
            cur = par

        row0 = i * block - halo
        h_e = bufs[0][cur]
        h_o = bufs[1][cur]

        # heights are constant across every phase of the launch: hoist the
        # neighbor-height maps, drain-eligibility compares, and lattice
        # masks out of the phase bodies (they'd otherwise be recomputed
        # 4·ppl times per launch with no cross-launch CSE possible)
        pre_z = (_pool._pair_pre(h_e, h_o, 0, res, row0=row0),
                 _pool._pair_pre(h_o, h_e, 1, res, row0=row0))
        masks = {xo: _pool._pair_geo_mask(h_e.shape, xo, res, row0)
                 for xo in (0, 1)}

        def apply_phase(c, xo, zo):
            p_e, p_o, d_e, d_o = c
            if zo == 0:
                na, nc, da, dc = _pool._phase_pair(
                    h_e, h_o, p_e, p_o, xo, 0, drain_particles, res,
                    row0=row0, pre=pre_z[0], geo_mask=masks[xo])
                return na, nc, d_e + da, d_o + dc
            na, nc, da, dc = _pool._phase_pair(
                h_o, h_e, p_o, p_e, xo, 1, drain_particles, res, row0=row0,
                pre=pre_z[1], geo_mask=masks[xo])
            return nc, na, d_e + dc, d_o + da

        carry = tuple(bufs[n][cur] for n in (2, 3, 4, 5))
        if unroll:
            for xo, zo in phase_seq:
                carry = apply_phase(carry, xo, zo)
            final = carry
        else:
            branches = [
                (lambda xo, zo: lambda c: apply_phase(c, xo, zo))(xo, zo)
                for xo, zo in _pool._PHASE_ORDER
            ]

            def body(t, c):
                return jax.lax.switch((t + phase0) % 4, branches, c)

            final = jax.lax.fori_loop(0, len(phase_seq), body, carry)

        sl = slice(halo, halo + block)
        for n in range(4):
            outs[n][:] = final[n][sl, :]

    out_spec = pl.BlockSpec((block, res), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=(out_spec,) * 4,
        out_shape=tuple(
            jax.ShapeDtypeStruct((r2, res), _F32) for _ in range(4)
        ),
        scratch_shapes=[pltpu.VMEM((2, w, res), _F32) for _ in range(6)]
        + [pltpu.SemaphoreType.DMA((2,))] * 6,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(h_e_pad, h_o_pad, p_e_pad, p_o_pad, d_e_pad, d_o_pad)
    return outs


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "drain_particles", "block",
                     "phases_per_launch", "unroll"),
)
def pool_automata_pallas_pair_fused(height, pool, iterations: int = 10,
                                    drain_particles: bool = True,
                                    block: int = None,
                                    phases_per_launch: int = 4,
                                    unroll: bool = True):
    """Half-row-pair pool automata with ``phases_per_launch`` phases fused
    per pallas launch (one water step per launch at the default 4).
    Bit-exact with pool_automata — shared _phase_pair, drain accumulators
    threaded through the kernel in phase order."""
    res = height.shape[0]
    ppl = phases_per_launch
    assert (4 * iterations) % ppl == 0, (ppl, iterations)
    # multiple of 8: TPU DMA windows want 8-row alignment (CLAUDE.md) and
    # the kernel's window starts are computed in 8-row units
    halo = max(-(-2 * ppl // 8) * 8, 8)
    r2 = res // 2
    if block is None:
        from ..ops.pallas.blocks import pick_block

        block = pick_block(r2, halo, cols=res)
    # the kernel's 8-row-unit window-start arithmetic (Mosaic divisibility
    # proof) needs both 8-aligned
    assert block % 8 == 0 and halo % 8 == 0, (block, halo)
    full_seq = tuple(_pool._PHASE_ORDER) * iterations
    n_launches = (4 * iterations) // ppl
    seqs = []
    for k in range(n_launches):
        seq = full_seq[k * ppl:(k + 1) * ppl]
        if seq not in seqs:
            seqs.append(seq)
    n_variants = len(seqs)

    from ..ops.pallas.batching import sequential_vmap

    @sequential_vmap
    def run_all(height, pool):
        h_e, h_o = _pool._halfrow_views(height, 0)
        p_e0, p_o0 = _pool._halfrow_views(pool, 0)
        hpe, hpo = _padH(h_e, halo), _padH(h_o, halo)
        z0 = jnp.zeros_like(p_e0)

        def make_launch(seq):
            def run(c):
                # carries re-padded per launch (measured neutral — the
                # pads buy the uniform branch-free window geometry the
                # prefetch pipeline needs, see _fused_pair_call)
                p_e, p_o, d_e, d_o = c
                return tuple(_fused_pair_call(
                    hpe, hpo, _padH(p_e, halo), _padH(p_o, halo),
                    _padH(d_e, halo), _padH(d_o, halo),
                    seq, drain_particles, res, block, halo, unroll,
                ))
            return run

        launches = [make_launch(seq) for seq in seqs]

        def step(carry, t):
            if n_variants == 1:
                return launches[0](carry), None
            return jax.lax.switch(t % n_variants, launches, carry), None

        def wet_path(init):
            (p_e, p_o, d_e, d_o), _ = jax.lax.scan(
                step, init, jnp.arange(n_launches, dtype=jnp.int32))
            return p_e, p_o, d_e, d_o

        # ONE upfront wetness gate at the per-cell activity threshold: a
        # grid with no cell at/above MIN_WATER is a bit-exact fixed point
        # of the automata (see pool.MIN_WATER — reference parity
        # LiveErosionDataTypes.cs:972), so all launches skip for the cost
        # of one reduction.  Cold-start pipelines (particle deposits
        # ≈5e-4 < the 1e-3 gate) hit this every cycle; a grid that dries
        # out MID-call only runs no-op launches, which is numerically
        # identical — cheaper than a per-launch reduction+cond.
        p_e, p_o, d_e, d_o = jax.lax.cond(
            jnp.any(pool >= _pool.MIN_WATER), wet_path, lambda init: init,
            (p_e0, p_o0, z0, z0))
        return (
            _pool._halfrow_join(p_e, p_o, 0),
            _pool._halfrow_join(d_e, d_o, 0),
        )

    return run_all(height, pool)


def _padH(a, h: int):
    return jnp.concatenate(
        [
            jnp.broadcast_to(a[:1, :], (h,) + a.shape[1:]),
            a,
            jnp.broadcast_to(a[-1:, :], (h,) + a.shape[1:]),
        ],
        axis=0,
    )


def _mega_call(h_e_pad, h_o_pad, c_bufs, phase_seq, n_groups: int,
               drain_particles: bool, res: int, block: int, halo: int):
    """ALL phase groups in ONE pallas launch: ``grid = (n_groups, nblk)``
    runs the whole ×``iterations`` automata as one sequential TPU grid,
    eliminating the per-launch overhead (~0.17 ms × n_launches fitted,
    BENCH_HISTORY round 4) and the inter-launch XLA glue entirely.

    Carries (pools + drain accumulators) ping-pong between two row slots
    of one (2·r2, res) HBM buffer per field (``input_output_aliases`` —
    group g reads slot g%2, writes slot (g+1)%2; the caller fills slot 0
    and takes slot n_groups%2 back).  Carry windows clamp their DMA at
    the grid edges with zeroed ghost rows — the padless geometry (border
    semantics key on global lattice coords via ``row0``; ghost values are
    coordinate-masked, proven bit-exact round 4).  Writes are manual
    VMEM→HBM DMAs from a single staging buffer per field, started after
    each block's compute and waited exactly once each:

      * write (g, j<nblk-1) → waited by (g, j+1) before it refills the
        staging buffer (the write overlaps block j+1's input DMA + phase
        chain — the round-3 "manual output DMA serializes" trap waited in
        the SAME grid step);
      * write (g, nblk-1)   → waited by (g+1, 0) BEFORE its carry reads
        (it lands in the slot group g+1 reads — the group boundary);
      * the final step waits its own write before the kernel ends.

    Read-safety across the boundary: block (g, j)'s window overlaps core
    rows of (g-1, j-1/j/j+1) only; those writes were waited by
    (g-1, j+1/j+2) or (g, 0), all sequentially earlier.  Heights are
    call-constant padded inputs with uniform windows, started first and
    waited after the carry branches (overlap)."""
    r2 = res // 2
    nblk = r2 // block
    w = block + 2 * halo

    def kernel(*refs):
        h_ins = refs[:2]
        c_ins = refs[2:6]
        c_outs = refs[6:10]
        win = refs[10:16]       # (w, res) input windows: 2 heights + 4 carries
        stg = refs[16:20]       # (block, res) write staging per carry field
        sem_in = refs[20]       # DMA sems (6,) input windows
        sem_w = refs[21]        # DMA sems (4,) staged writes
        g = pl.program_id(0)
        j = pl.program_id(1)

        rs8 = jax.lax.rem(g, 2) * (r2 // 8)            # read-slot row base /8
        ws8 = jax.lax.rem(g + 1, 2) * (r2 // 8)        # write-slot row base /8

        def write_copies(dst_u8):
            return [
                pltpu.make_async_copy(
                    stg[f], c_outs[f].at[pl.ds(dst_u8 * 8, block), :],
                    sem_w.at[f])
                for f in range(4)
            ]

        # group boundary: the (g-1, nblk-1) write lands in the slot this
        # group reads — wait it before any carry read (also frees staging)
        def wait_prev_group():
            for cp in write_copies(rs8 + (nblk - 1) * (block // 8)):
                cp.wait()

        pl.when((j == 0) & (g > 0))(wait_prev_group)

        # heights: uniform windows over the padded inputs, started first
        jb8 = j * (block // 8)
        hcopies = [
            pltpu.make_async_copy(
                src.at[pl.ds(jb8 * 8, w), :], dst, sem_in.at[f])
            for f, (src, dst) in enumerate(zip(h_ins, win[:2]))
        ]
        for cp in hcopies:
            cp.start()

        # carries: clamped windows from read slot g%2, ghost rows zeroed
        # (values unused — geometry masks key on row0; zeroing keeps any
        # masked-multiply arithmetic NaN-free).  Static geometry per case.
        carry_trips = [(c_ins[f], win[2 + f], sem_in.at[2 + f])
                       for f in range(4)]
        zrows = jnp.zeros((halo, res), _F32)

        def run_copies(cps, zero_lo: bool, zero_hi: int):
            for _, dst, _ in carry_trips:
                if zero_lo:
                    dst[0:halo, :] = zrows
                if zero_hi:
                    dst[w - zero_hi:w, :] = jnp.zeros((zero_hi, res), _F32)
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

        def first_geo():
            run_copies([
                pltpu.make_async_copy(
                    src.at[pl.ds(rs8 * 8, block + halo), :],
                    dst.at[pl.ds(halo, block + halo), :], sem)
                for src, dst, sem in carry_trips
            ], zero_lo=True, zero_hi=0)

        def last_geo():
            u8 = rs8 + jb8 - (halo // 8)
            run_copies([
                pltpu.make_async_copy(
                    src.at[pl.ds(u8 * 8, block + halo), :],
                    dst.at[pl.ds(0, block + halo), :], sem)
                for src, dst, sem in carry_trips
            ], zero_lo=False, zero_hi=halo)

        def mid_geo():
            u8 = rs8 + jb8 - (halo // 8)
            run_copies([
                pltpu.make_async_copy(
                    src.at[pl.ds(u8 * 8, w), :], dst, sem)
                for src, dst, sem in carry_trips
            ], zero_lo=False, zero_hi=0)

        if nblk == 1:
            run_copies([
                pltpu.make_async_copy(
                    src.at[pl.ds(rs8 * 8, r2), :],
                    dst.at[pl.ds(halo, r2), :], sem)
                for src, dst, sem in carry_trips
            ], zero_lo=True, zero_hi=halo)
        else:
            pl.when(j == 0)(first_geo)
            pl.when(j == nblk - 1)(last_geo)
            if nblk > 2:
                pl.when((j > 0) & (j < nblk - 1))(mid_geo)

        for cp in hcopies:
            cp.wait()

        row0 = j * block - halo
        h_e = win[0][:]
        h_o = win[1][:]

        # heights are constant across every phase: hoist the neighbor maps,
        # drain compares, and lattice masks out of the phase bodies
        pre_z = (_pool._pair_pre(h_e, h_o, 0, res, row0=row0),
                 _pool._pair_pre(h_o, h_e, 1, res, row0=row0))
        masks = {xo: _pool._pair_geo_mask(h_e.shape, xo, res, row0)
                 for xo in (0, 1)}

        def apply_phase(c, xo, zo):
            p_e, p_o, d_e, d_o = c
            if zo == 0:
                na, nc, da, dc = _pool._phase_pair(
                    h_e, h_o, p_e, p_o, xo, 0, drain_particles, res,
                    row0=row0, pre=pre_z[0], geo_mask=masks[xo])
                return na, nc, d_e + da, d_o + dc
            na, nc, da, dc = _pool._phase_pair(
                h_o, h_e, p_o, p_e, xo, 1, drain_particles, res, row0=row0,
                pre=pre_z[1], geo_mask=masks[xo])
            return nc, na, d_e + dc, d_o + da

        carry = tuple(win[2 + f][:] for f in range(4))
        for xo, zo in phase_seq:
            carry = apply_phase(carry, xo, zo)

        # staging reuse guard: the previous block's write must have left
        # the staging buffer before this block refills it (the write has
        # been overlapping this block's input DMAs + phase chain)
        def wait_prev_block():
            for cp in write_copies(ws8 + (j - 1) * (block // 8)):
                cp.wait()

        if nblk > 1:
            pl.when(j > 0)(wait_prev_block)

        sl = slice(halo, halo + block)
        for f in range(4):
            stg[f][:] = carry[f][sl, :]
        own = write_copies(ws8 + jb8)
        for cp in own:
            cp.start()

        # the very last write has no later step to wait it
        def wait_own():
            for cp in own:
                cp.wait()

        pl.when((g == n_groups - 1) & (j == nblk - 1))(wait_own)

    outs = pl.pallas_call(
        kernel,
        grid=(n_groups, nblk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),) * 4,
        out_shape=tuple(
            jax.ShapeDtypeStruct((2 * r2, res), _F32) for _ in range(4)
        ),
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3},
        scratch_shapes=[pltpu.VMEM((w, res), _F32) for _ in range(6)]
        + [pltpu.VMEM((block, res), _F32) for _ in range(4)]
        + [pltpu.SemaphoreType.DMA((6,)), pltpu.SemaphoreType.DMA((4,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(h_e_pad, h_o_pad, *c_bufs)
    return outs


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "drain_particles", "block",
                     "phases_per_launch"),
)
def pool_automata_pallas_mega(height, pool, iterations: int = 10,
                              drain_particles: bool = True,
                              block: int = None,
                              phases_per_launch: int = 4):
    """Half-row-pair pool automata as ONE pallas launch for the whole
    ×``iterations`` call (``_mega_call``).  Bit-exact with pool_automata —
    same _phase_pair core, same per-group phase partition as
    pool_automata_pallas_pair_fused at equal (block, phases_per_launch).
    Requires 4 | phases_per_launch (uniform groups)."""
    res = height.shape[0]
    ppl = phases_per_launch
    assert ppl % 4 == 0 and (4 * iterations) % ppl == 0, (ppl, iterations)
    halo = max(-(-2 * ppl // 8) * 8, 8)
    r2 = res // 2
    if block is None:
        from ..ops.pallas.blocks import pick_block

        block = pick_block(r2, halo, cols=res)
    assert block % 8 == 0 and halo % 8 == 0, (block, halo)
    n_groups = (4 * iterations) // ppl
    seq = tuple(_pool._PHASE_ORDER) * (ppl // 4)
    fs = (n_groups % 2) * r2

    from ..ops.pallas.batching import sequential_vmap

    @sequential_vmap
    def run_all(height, pool):
        h_e, h_o = _pool._halfrow_views(height, 0)
        p_e0, p_o0 = _pool._halfrow_views(pool, 0)
        hpe, hpo = _padH(h_e, halo), _padH(h_o, halo)
        z0 = jnp.zeros_like(p_e0)

        def wet_path(init):
            # slot 0 = initial state, slot 1 = ping-pong scratch
            c_bufs = [jnp.concatenate([x, z0], 0) for x in init]
            outs = _mega_call(hpe, hpo, c_bufs, seq, n_groups,
                              drain_particles, res, block, halo)
            return tuple(o[fs:fs + r2] for o in outs)

        # same call-level wetness gate as the pair-fused kernel (a grid
        # with no cell at/above MIN_WATER is a bit-exact fixed point)
        p_e, p_o, d_e, d_o = jax.lax.cond(
            jnp.any(pool >= _pool.MIN_WATER), wet_path, lambda init: init,
            (p_e0, p_o0, z0, z0))
        return (
            _pool._halfrow_join(p_e, p_o, 0),
            _pool._halfrow_join(d_e, d_o, 0),
        )

    return run_all(height, pool)


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "drain_particles", "block",
                     "phases_per_launch", "unroll"),
)
def pool_automata_pallas_quad(height, pool, iterations: int = 10,
                              drain_particles: bool = True,
                              block: int = None,
                              phases_per_launch: int = 4,
                              unroll: bool = None):
    """Diagonal-quadrant pool automata with multi-phase-fused pallas
    launches: each launch runs ``phases_per_launch`` phases (multiples of 4
    = whole water steps) entirely in VMEM per row block.

    vs pool_automata_pallas_pair this (a) halves the elementwise work — the
    sorting network and sub-steps run only on each phase's active diagonal
    lattice (res²/4 cells) — and (b) pays the halo DMA once per launch
    instead of once per phase.  Bit-exact with pool_automata (shared
    _phase_core / _quad_phase_step; tested)."""
    res = height.shape[0]
    ppl = phases_per_launch
    assert (4 * iterations) % ppl == 0, (ppl, iterations)
    # halo ≥ 2·ppl (validity shrink), rounded up to the (8,·) sublane tiling
    halo = max(-(-2 * ppl // 4) * 4, 4)
    r2 = res // 2
    if block is None:
        from ..ops.pallas.blocks import pick_block

        block = pick_block(r2, halo, cols=res // 2)
    if unroll is None:
        # fori_loop+switch default: the unrolled multi-phase body executes
        # pathologically in interpret mode (tests), and on-chip the quad
        # variants measure within ~2 ms either way (25.5 vs 27.4 ms)
        unroll = False
    full_seq = tuple(_pool._PHASE_ORDER) * iterations
    n_launches = (4 * iterations) // ppl
    # distinct launch-start offsets into the 4-phase order (1 when 4 | ppl)
    seqs = []
    for k in range(n_launches):
        seq = full_seq[k * ppl:(k + 1) * ppl]
        if seq not in seqs:
            seqs.append(seq)
    n_variants = len(seqs)

    h_quads = _pool._pack_quads(height)
    h_pads = tuple(_padH(h_quads[kk], halo) for kk in _pool._QKEYS)
    p_quads = _pool._pack_quads(pool)
    p0 = tuple(p_quads[kk] for kk in _pool._QKEYS)
    d0 = tuple(jnp.zeros_like(x) for x in p0)

    def make_launch(seq):
        def run(c):
            pq, dq = c
            p_pads = tuple(_padH(x, halo) for x in pq)
            d_pads = tuple(_padH(x, halo) for x in dq)
            new_p, new_d = _fused_quad_call(
                h_pads, p_pads, d_pads, seq, drain_particles, res,
                block, halo, unroll,
            )
            return tuple(new_p), tuple(new_d)
        return run

    launches = [make_launch(seq) for seq in seqs]

    def step(carry, t):
        pq, dq = carry

        def wet(c):
            if n_variants == 1:
                return launches[0](c)
            return jax.lax.switch(t % n_variants, launches, c)

        has_water = jnp.any(jnp.stack([jnp.any(x > 0.0) for x in pq]))
        return jax.lax.cond(has_water, wet, lambda c: c, (pq, dq)), None

    (pq, dq), _ = jax.lax.scan(
        step, (p0, d0), jnp.arange(n_launches, dtype=jnp.int32)
    )
    return (
        _pool._unpack_quads(dict(zip(_pool._QKEYS, pq))),
        _pool._unpack_quads(dict(zip(_pool._QKEYS, dq))),
    )


@functools.partial(
    jax.jit, static_argnames=("iterations", "drain_particles", "block")
)
def pool_automata_pallas(height, pool, iterations: int = 10,
                         drain_particles: bool = True, block: int = 256):
    """pool_automata with pallas phase kernels.  Requires res % block == 0
    and res a multiple of 8/128 tiling (production grids are)."""
    res = height.shape[0]
    height_pad = jnp.pad(height, ((4, 4), (0, 0)), mode="edge")

    def one_phase(pool, xoff, zoff):
        pool_pad = jnp.pad(pool, ((4, 4), (0, 0)), mode="edge")
        return _phase_call(
            height_pad, pool_pad, xoff, zoff, drain_particles, res, block
        )

    def make_branch(xo, zo):
        def br(carry):
            pool, drains = carry
            new_pool, dm = one_phase(pool, xo, zo)
            return new_pool, drains + dm
        return br

    branches = [make_branch(xo, zo) for xo in (0, 1) for zo in (0, 1)]

    def step(carry, t):
        has_water = jnp.any(carry[0] > 0.0)
        out = jax.lax.cond(
            has_water,
            lambda c: jax.lax.switch(t % 4, branches, c),
            lambda c: c,
            carry,
        )
        return out, None

    (pool, drains), _ = jax.lax.scan(
        step, (pool, jnp.zeros_like(pool)),
        jnp.arange(4 * iterations, dtype=jnp.int32),
    )
    return pool, drains
