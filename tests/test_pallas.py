"""Pallas kernel correctness (interpret mode on CPU): the fused blur chain
must equal the iterated XLA separable series exactly, including boundary
re-clamping per iteration."""

import numpy as np
import pytest
import jax.numpy as jnp

from noize_tpu.ops import kernels as K
from noize_tpu.ops.pallas import stencil as PS

RNG = np.random.default_rng(53)


def reference_chain(a, taps, iterations):
    for _ in range(iterations):
        a = K.separable_series(a, taps, taps, 1.0)
    return a


@pytest.mark.parametrize("iterations", [1, 3])
def test_fused_chain_matches_xla(iterations):
    res, block = 128, 64
    a = jnp.asarray(RNG.uniform(0, 1, (res, res)).astype(np.float32))
    taps = K.gaussian_taps(1.0, 5)
    got = np.asarray(PS._interpret_chain(a, taps, iterations, block))
    want = np.asarray(reference_chain(a, taps, iterations))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_chain_border_semantics():
    """Borders are where per-iteration re-clamping matters; use a field
    with strong gradients at the edges."""
    res, block = 128, 64
    a = np.zeros((res, res), np.float32)
    a[0, :] = 5.0
    a[:, -1] = -3.0
    a[40:60, 40:60] = 2.0
    taps = K.gaussian_taps(2.0, 9)
    got = np.asarray(PS._interpret_chain(jnp.asarray(a), taps, 2, block))
    want = np.asarray(reference_chain(jnp.asarray(a), taps, 2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gauss_chain_wrapper():
    res = 128
    a = jnp.asarray(RNG.uniform(0, 1, (res, res)).astype(np.float32))
    got = np.asarray(PS.gauss_chain(a, 5, "s1d00", 2, block=64, interpret=True))
    want = np.asarray(reference_chain(a, K.gaussian_taps(1.0, 5), 2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_indivisible_resolution_rejected():
    with pytest.raises(ValueError):
        PS.fused_separable_chain(jnp.zeros((100, 100)), K.gaussian_taps(1.0, 5), 1, 64)


class TestPoolPallas:
    def test_matches_xla_path(self):
        from jax.experimental.pallas import tpu as pltpu
        from noize_tpu.erosion import pool as PO
        from noize_tpu.erosion import pool_pallas as PP

        res = 32
        rng = np.random.default_rng(4)
        h = jnp.asarray(rng.uniform(0, 0.5, (res, res)).astype(np.float32))
        p = jnp.asarray(rng.uniform(0, 0.05, (res, res)).astype(np.float32))
        for dp in (True, False):
            with pltpu.force_tpu_interpret_mode():
                gp, gd = PP.pool_automata_pallas(h, p, iterations=2,
                                                 drain_particles=dp, block=16)
            wp, wd = PO.pool_automata(h, p, iterations=2, drain_particles=dp)
            np.testing.assert_allclose(np.asarray(gp), np.asarray(wp), atol=1e-7)
            np.testing.assert_allclose(np.asarray(gd), np.asarray(wd), atol=1e-7)

    def test_fused_quad_kernel_matches_xla_path(self):
        """The multi-phase-fused diagonal-quadrant kernel must be BIT-exact
        with the XLA pair path — pools and drain maps — across launch
        boundaries (drain accumulators ride through the kernel to keep the
        f32 add order)."""
        from jax.experimental.pallas import tpu as pltpu
        from noize_tpu.erosion import pool as PO
        from noize_tpu.erosion import pool_pallas as PP

        res = 32
        rng = np.random.default_rng(21)
        h = jnp.asarray(rng.uniform(0, 0.5, (res, res)).astype(np.float32))
        p = jnp.asarray(
            (rng.uniform(-0.05, 0.05, (res, res))).clip(0).astype(np.float32))
        wp, wd = PO.pool_automata(h, p, iterations=2, drain_particles=True)
        with pltpu.force_tpu_interpret_mode():
            gp, gd = PP.pool_automata_pallas_quad(
                h, p, iterations=2, drain_particles=True, block=8,
                phases_per_launch=4)
        np.testing.assert_array_equal(np.asarray(gp), np.asarray(wp))
        np.testing.assert_array_equal(np.asarray(gd), np.asarray(wd))

    def test_fused_quad_kernel_two_steps_per_launch(self):
        """phases_per_launch=8 (two whole water steps fused per launch)."""
        from jax.experimental.pallas import tpu as pltpu
        from noize_tpu.erosion import pool as PO
        from noize_tpu.erosion import pool_pallas as PP

        res = 32
        rng = np.random.default_rng(22)
        h = jnp.asarray(rng.uniform(0, 0.5, (res, res)).astype(np.float32))
        p = jnp.asarray(rng.uniform(0, 0.05, (res, res)).astype(np.float32))
        wp, wd = PO.pool_automata(h, p, iterations=2, drain_particles=True)
        with pltpu.force_tpu_interpret_mode():
            gp, gd = PP.pool_automata_pallas_quad(
                h, p, iterations=2, drain_particles=True, block=16,
                phases_per_launch=8)
        np.testing.assert_array_equal(np.asarray(gp), np.asarray(wp))
        np.testing.assert_array_equal(np.asarray(gd), np.asarray(wd))

    def test_fused_flow_map_matches_xla_path(self):
        """Single-launch flow kernel (init + iterations + velocity +
        normalize all in VMEM) must equal ops.flow.flow_map bit-for-bit,
        including the clamped-border ghost reclamping."""
        from jax.experimental.pallas import tpu as pltpu
        from noize_tpu.ops import flow as FL
        from noize_tpu.ops.pallas import flow_pl as FP

        rng = np.random.default_rng(33)
        for res, iters, block in ((64, 2, 16), (128, 3, 32)):
            h = jnp.asarray(rng.uniform(0, 1, (res, res)).astype(np.float32))
            want = np.asarray(FL.flow_map(h, iterations=iters))
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(
                    FP.flow_map_fused(h, iterations=iters, block=block))
            np.testing.assert_array_equal(got, want)

    def test_fused_pair_kernel_matches_xla_path(self):
        """Multi-phase-fused pair kernel: bit-exact pools AND drains across
        launch boundaries, for 1/2/4 phases per launch."""
        from jax.experimental.pallas import tpu as pltpu
        from noize_tpu.erosion import pool as PO
        from noize_tpu.erosion import pool_pallas as PP

        res = 32
        rng = np.random.default_rng(31)
        h = jnp.asarray(rng.uniform(0, 0.5, (res, res)).astype(np.float32))
        p = jnp.asarray(
            (rng.uniform(-0.05, 0.05, (res, res))).clip(0).astype(np.float32))
        wp, wd = PO.pool_automata(h, p, iterations=2, drain_particles=True)
        with pltpu.force_tpu_interpret_mode():
            for ppl, unroll in ((1, True), (4, False)):
                gp, gd = PP.pool_automata_pallas_pair_fused(
                    h, p, iterations=2, drain_particles=True, block=8,
                    phases_per_launch=ppl, unroll=unroll)
                np.testing.assert_array_equal(np.asarray(gp), np.asarray(wp))
                np.testing.assert_array_equal(np.asarray(gd), np.asarray(wd))

    def test_fused_pair_below_gate_skips_bit_exact(self):
        """The fused kernel's call-level wetness gate sits at the per-cell
        activity threshold (pool.MIN_WATER): a below-gate pool must come
        back bit-identical with zero drains (it is a fixed point — see
        pool.MIN_WATER), and a pool with one at-gate cell must still run
        the full kernel and match the XLA path bit-for-bit."""
        from jax.experimental.pallas import tpu as pltpu
        from noize_tpu.erosion import pool as PO
        from noize_tpu.erosion import pool_pallas as PP

        res = 32
        rng = np.random.default_rng(41)
        h = jnp.asarray(rng.uniform(0, 0.5, (res, res)).astype(np.float32))
        # everywhere strictly below the gate — cold-start flagship shape
        p_dry = jnp.asarray(
            rng.uniform(0, PO.MIN_WATER * 0.99,
                        (res, res)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            gp, gd = PP.pool_automata_pallas_pair_fused(
                h, p_dry, iterations=2, drain_particles=True, block=8,
                phases_per_launch=4)
        np.testing.assert_array_equal(np.asarray(gp), np.asarray(p_dry))
        assert float(np.abs(np.asarray(gd)).sum()) == 0.0
        # one cell at exactly the gate: the kernel must run and match XLA
        p_wet = np.asarray(p_dry).copy()
        p_wet[11, 13] = np.float32(PO.MIN_WATER)
        p_wet = jnp.asarray(p_wet)
        wp, wd = PO.pool_automata(h, p_wet, iterations=2,
                                  drain_particles=True)
        assert not np.array_equal(np.asarray(wp), np.asarray(p_wet))
        with pltpu.force_tpu_interpret_mode():
            gp, gd = PP.pool_automata_pallas_pair_fused(
                h, p_wet, iterations=2, drain_particles=True, block=8,
                phases_per_launch=4)
        np.testing.assert_array_equal(np.asarray(gp), np.asarray(wp))
        np.testing.assert_array_equal(np.asarray(gd), np.asarray(wd))

    def test_mega_kernel_matches_xla_path(self):
        """Single-launch mega kernel (the whole ×iterations automata as one
        grid=(n_groups, nblk) pallas call, ping-pong HBM carry slots): must
        be BIT-exact with the XLA pair path — pools and drains — across
        group boundaries, multi-block (4, 8 → grid=(2,2): cross-group
        ping-pong + cross-block staging waits) and single-block (4, 16 →
        the nblk==1 clamp geometry).

        ppl=8 (an 8-phase kernel body) is deliberately NOT interpret-
        tested: the TPU-interpret lowering's XLA:CPU compile time explodes
        super-linearly in phases-per-body (4 phases ≈ 40-75 s, 8 phases
        >10 min — measured round 5; this hung the suite).  The ppl=8
        geometry shares every code path with ppl=4 except the phase-seq
        length and is A/B'd bit-exact on real hardware
        (scripts/probe_pool_mega.py, BENCH_HISTORY round 5)."""
        from jax.experimental.pallas import tpu as pltpu
        from noize_tpu.erosion import pool as PO
        from noize_tpu.erosion import pool_pallas as PP

        res = 32
        rng = np.random.default_rng(51)
        h = jnp.asarray(rng.uniform(0, 0.5, (res, res)).astype(np.float32))
        p = jnp.asarray(
            (rng.uniform(-0.05, 0.05, (res, res))).clip(0).astype(np.float32))
        wp, wd = PO.pool_automata(h, p, iterations=2, drain_particles=True)
        with pltpu.force_tpu_interpret_mode():
            for ppl, block in ((4, 8), (4, 16)):
                gp, gd = PP.pool_automata_pallas_mega(
                    h, p, iterations=2, drain_particles=True, block=block,
                    phases_per_launch=ppl)
                np.testing.assert_array_equal(np.asarray(gp), np.asarray(wp))
                np.testing.assert_array_equal(np.asarray(gd), np.asarray(wd))

    def test_mega_kernel_below_gate_skips_bit_exact(self):
        """The mega kernel keeps the same call-level wetness gate as the
        pair-fused kernel: a below-gate pool returns bit-identical with
        zero drains without launching the grid."""
        from jax.experimental.pallas import tpu as pltpu
        from noize_tpu.erosion import pool as PO
        from noize_tpu.erosion import pool_pallas as PP

        res = 32
        rng = np.random.default_rng(52)
        h = jnp.asarray(rng.uniform(0, 0.5, (res, res)).astype(np.float32))
        p_dry = jnp.asarray(
            rng.uniform(0, PO.MIN_WATER * 0.99,
                        (res, res)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            gp, gd = PP.pool_automata_pallas_mega(
                h, p_dry, iterations=2, drain_particles=True, block=8,
                phases_per_launch=4)
        np.testing.assert_array_equal(np.asarray(gp), np.asarray(p_dry))
        assert float(np.abs(np.asarray(gd)).sum()) == 0.0

    def test_pair_kernel_sparse_water(self):
        """Sparse water (the production shape — pools sit in basins):
        results must match the XLA path exactly."""
        from jax.experimental.pallas import tpu as pltpu
        from noize_tpu.erosion import pool as PO
        from noize_tpu.erosion import pool_pallas as PP

        res = 64
        rng = np.random.default_rng(9)
        h = jnp.asarray(rng.uniform(0, 0.5, (res, res)).astype(np.float32))
        p = np.zeros((res, res), np.float32)
        p[40:48, :] = rng.uniform(0, 0.05, (8, res)).astype(np.float32)
        p = jnp.asarray(p)
        with pltpu.force_tpu_interpret_mode():
            gp, gd = PP.pool_automata_pallas_pair(
                h, p, iterations=2, drain_particles=True, block=8)
        wp, wd = PO.pool_automata(h, p, iterations=2, drain_particles=True)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(wp), atol=1e-7)
        np.testing.assert_allclose(np.asarray(gd), np.asarray(wd), atol=1e-7)

    def test_pair_kernel_matches_xla_path(self):
        from jax.experimental.pallas import tpu as pltpu
        from noize_tpu.erosion import pool as PO
        from noize_tpu.erosion import pool_pallas as PP

        res = 32
        rng = np.random.default_rng(7)
        h = jnp.asarray(rng.uniform(0, 0.5, (res, res)).astype(np.float32))
        p = jnp.asarray(rng.uniform(0, 0.05, (res, res)).astype(np.float32))
        for dp in (True, False):
            with pltpu.force_tpu_interpret_mode():
                gp, gd = PP.pool_automata_pallas_pair(
                    h, p, iterations=2, drain_particles=dp, block=8)
            wp, wd = PO.pool_automata(h, p, iterations=2, drain_particles=dp)
            np.testing.assert_allclose(np.asarray(gp), np.asarray(wp), atol=1e-7)
            np.testing.assert_allclose(np.asarray(gd), np.asarray(wd), atol=1e-7)


class TestFlowPallas:
    def test_matches_xla_path(self):
        from jax.experimental.pallas import tpu as pltpu
        from noize_tpu.ops import flow as FL
        from noize_tpu.ops.pallas import flow_pl as FP

        res = 64
        rng = np.random.default_rng(2)
        h = jnp.asarray(rng.uniform(0, 1, (res, res)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = FP.flow_map_pallas(h, iterations=6, block=32)
        want = FL.flow_map(h, iterations=6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-7)


def test_fused_thermal_matches_xla_path():
    """Fused thermal kernel vs ops.thermal.thermal_erosion.

    1-ulp tolerance: XLA CPU compiles mathematically identical programs
    with different FMA-contraction decisions depending on fusion context
    (verified: two plain-XLA jits of the SAME phase chain differ by
    5.96e-8 on ~1% of cells), so bitwise equality between separately
    compiled thermal programs is not achievable on the CPU backend."""
    from jax.experimental.pallas import tpu as pltpu
    from noize_tpu.ops import thermal as T
    from noize_tpu.ops.pallas import thermal_pl as TP

    rng = np.random.default_rng(35)
    for res, iters, block in ((64, 1, 16), (128, 2, 64)):
        h = jnp.asarray(rng.uniform(0, 1, (res, res)).astype(np.float32))
        want = np.asarray(T.thermal_erosion(h, 45.0, 0.5, 1.0,
                                            iterations=iters))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(TP.thermal_erosion_fused(
                h, 45.0, 0.5, 1.0, iterations=iters, block=block,
                unroll=False))
        np.testing.assert_allclose(got, want, atol=2e-7)


def test_fused_kernels_batch_via_sequential_vmap():
    """Manual-DMA pallas kernels can't be batched by the standard vmap
    rule; sequential_vmap must make vmap (the tile_batch dp path) lower to
    a per-tile lax.map with results equal to per-tile calls."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from noize_tpu.ops import thermal as T, flow as FL
    from noize_tpu.ops.pallas import thermal_pl as TP, flow_pl as FP
    from noize_tpu.erosion import pool as PO, pool_pallas as PP

    rng = np.random.default_rng(51)
    res = 32
    hb = jnp.asarray(rng.uniform(0, 1, (2, res, res)).astype(np.float32))
    pb = jnp.asarray(rng.uniform(0, 0.05, (2, res, res)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        tout = jax.vmap(lambda x: TP.thermal_erosion_fused(
            x, 45.0, 0.5, 1.0, iterations=1, block=8, unroll=False))(hb)
        fout = jax.vmap(lambda x: FP.flow_map_fused(
            x, iterations=2, block=8))(hb)
        pout = jax.vmap(lambda h, p: PP.pool_automata_pallas_pair_fused(
            h, p, iterations=2, drain_particles=True, block=8,
            phases_per_launch=4, unroll=False)[0])(hb, pb)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(tout[i]),
            np.asarray(T.thermal_erosion(hb[i], 45.0, 0.5, 1.0,
                                         iterations=1)), atol=2e-7)
        np.testing.assert_array_equal(
            np.asarray(fout[i]), np.asarray(FL.flow_map(hb[i], iterations=2)))
        np.testing.assert_array_equal(
            np.asarray(pout[i]),
            np.asarray(PO.pool_automata(hb[i], pb[i], iterations=2)[0]))


class TestBlockPicker:
    def test_largest_fitting_block(self):
        from noize_tpu.ops.pallas.blocks import pick_block

        assert pick_block(1024, 8) == 256
        assert pick_block(1024, 8, cols=2048) == 256
        # wide field: the 6 MB/window cap steps the block down
        assert pick_block(8192, 8, cols=8192) == 128
        assert pick_block(8192, 20, cols=8192) == 128
        # halo dominates small candidates
        assert pick_block(1024, 80) == 256

    def test_descriptive_error(self):
        from noize_tpu.ops.pallas.blocks import pick_block

        with pytest.raises(ValueError, match="row block"):
            pick_block(100, 8)  # 100 not a multiple of any candidate
        with pytest.raises(ValueError, match="phases_per_launch"):
            pick_block(64, 300)  # halo larger than every candidate

    def test_rows_plan_shrinks_launch_depth(self):
        """Wide taps × a wide field: no candidate both covers the halo and
        fits the VMEM cap at the default launch depth — the rows planner
        halves iterations_per_launch (shrinking the halo) instead of
        raising.  width 25 (off 12) at 16384²: ipl 6 → halo 72 infeasible;
        ipl 3 → halo 40 → block 64 fits."""
        from noize_tpu.ops.pallas.stencil import _rows_plan

        assert _rows_plan(16384, 16384, 12, 6) == (64, 3)
        # comfortable regime: depth untouched
        assert _rows_plan(2048, 2048, 2, 6) == (256, 6)


def test_rows_chain_chunked_launch_depth():
    """Chunked launches (iterations > iterations_per_launch) chain
    bit-compatibly with the single-launch semantics — each launch re-pads
    from the true border, reproducing the per-iteration clamp.  Also: a
    block below the halo is REJECTED (interior blocks would read stale
    edge padding — measured ~0.5% border drift in that regime)."""
    res = 64
    a = RNG.uniform(0, 1, (res, 128)).astype(np.float32)
    taps = K.gaussian_taps(1.0, 5)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(PS.fused_separable_chain_rows(
            jnp.asarray(a), taps, 5, block=16, iterations_per_launch=2))
    want = np.asarray(reference_chain(jnp.asarray(a), taps, 5))
    np.testing.assert_allclose(got, want, atol=1e-6)

    with pytest.raises(ValueError, match="halo"):
        with pltpu.force_tpu_interpret_mode():
            PS.fused_separable_chain_rows(
                jnp.asarray(a), K.gaussian_taps(1.3, 9), 16, block=8,
                iterations_per_launch=16)


@pytest.mark.parametrize("iterations", [1, 3])
def test_rows_chain_matches_xla(iterations):
    """The full-width row-block fused blur equals the iterated XLA
    separable series, including border re-clamp per iteration."""
    res = 128
    a = np.zeros((res, res), np.float32)
    a[:] = RNG.uniform(0, 1, (res, res))
    a[0, :] += 3.0
    a[:, -1] -= 2.0
    taps = K.gaussian_taps(1.0, 5)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(PS.fused_separable_chain_rows(
            jnp.asarray(a), taps, iterations, block=64))
    want = np.asarray(reference_chain(jnp.asarray(a), taps, iterations))
    np.testing.assert_allclose(got, want, atol=1e-5)
