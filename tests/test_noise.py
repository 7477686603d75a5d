"""Golden tests: JAX float32 noise primitives vs NumPy float64 oracles.

Target tolerance tracks the build goal of <=1e-4 rel err vs the Burst
reference semantics (BASELINE.md): the lattice hashes are exact in float32,
so disagreement only comes from interpolation rounding.
"""

import numpy as np
import pytest

from noize_tpu.ops import noise as jn

import oracles


RNG = np.random.default_rng(42)


def coords2(n=4096, lo=-50.0, hi=50.0):
    return RNG.uniform(lo, hi, size=(n, 2))


def coords3(n=4096, lo=-50.0, hi=50.0):
    return RNG.uniform(lo, hi, size=(n, 3))


def assert_close(got, want, atol=1e-4, outlier_frac=0.02):
    """Elementwise closeness with a bounded outlier fraction.

    Both sides are float32; points that land exactly on a lattice-hash
    discontinuity can flip branches between op orderings (FMA contraction
    etc.) and produce O(1) differences — those must stay rare.
    """
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    err = np.abs(got - want)
    bad = err > (atol + 1e-4 * np.abs(want))
    frac = bad.mean()
    assert frac <= outlier_frac, (
        f"{frac:.2%} of points exceed tolerance (max err {err.max():.4g})"
    )
    # the well-behaved bulk must agree tightly
    assert np.median(err) < atol


class TestCnoise2:
    def test_oracle(self):
        p = coords2()
        got = jn.cnoise2(p[:, 0].astype(np.float32), p[:, 1].astype(np.float32))
        assert_close(got, oracles.cnoise2(p))

    def test_lattice_zero(self):
        # classic Perlin is 0 at integer lattice points
        p = RNG.integers(-40, 40, size=(256, 2)).astype(np.float64)
        got = jn.cnoise2(p[:, 0].astype(np.float32), p[:, 1].astype(np.float32))
        assert np.max(np.abs(np.asarray(got))) < 1e-5

    def test_range(self):
        p = coords2(20000)
        v = np.asarray(jn.cnoise2(p[:, 0].astype(np.float32), p[:, 1].astype(np.float32)))
        assert v.min() > -1.2 and v.max() < 1.2
        assert v.std() > 0.05  # actually varies


class TestCnoise3:
    def test_oracle(self):
        p = coords3()
        got = jn.cnoise3(*[p[:, i].astype(np.float32) for i in range(3)])
        assert_close(got, oracles.cnoise3(p))


class TestSnoise2:
    def test_oracle(self):
        p = coords2()
        got = jn.snoise2(p[:, 0].astype(np.float32), p[:, 1].astype(np.float32))
        assert_close(got, oracles.snoise2(p), atol=1e-4)

    def test_range(self):
        p = coords2(20000)
        v = np.asarray(jn.snoise2(p[:, 0].astype(np.float32), p[:, 1].astype(np.float32)))
        assert v.min() > -1.1 and v.max() < 1.1


class TestSnoise3:
    def test_oracle(self):
        p = coords3()
        got = jn.snoise3(*[p[:, i].astype(np.float32) for i in range(3)])
        assert_close(got, oracles.snoise3(p), atol=1e-4)


class TestPsrnoise2:
    def test_oracle(self):
        p = coords2(lo=0.0, hi=60.0)  # reference feeds positive world coords
        got = jn.psrnoise2(
            p[:, 0].astype(np.float32), p[:, 1].astype(np.float32), 1010.0, 102.0, 0.0
        )
        assert_close(got, oracles.psrnoise2(p, (1010.0, 102.0), 0.0), atol=1e-4)

    def test_oracle_rotated(self):
        p = coords2(lo=0.0, hi=60.0)
        got = jn.psrnoise2(
            p[:, 0].astype(np.float32), p[:, 1].astype(np.float32), 1010.0, 102.0, 0.62
        )
        assert_close(got, oracles.psrnoise2(p, (1010.0, 102.0), 0.62), atol=1e-4)

    def test_periodic(self):
        # Tiles with the requested period — but only where all simplex
        # lattice corners stay positive: Unity's math.fmod is a *truncated*
        # remainder (unlike GLSL's floored mod), so the reference itself
        # breaks tiling where wrapped lattice coords change sign.  We keep
        # that parity and sample away from 0.
        per = (10.0, 6.0)
        p = coords2(512, lo=3.0, hi=5.0)
        a = np.asarray(jn.psrnoise2(p[:, 0].astype(np.float32), p[:, 1].astype(np.float32), *per))
        b = np.asarray(
            jn.psrnoise2(
                (p[:, 0] + per[0]).astype(np.float32), p[:, 1].astype(np.float32), *per
            )
        )
        np.testing.assert_allclose(a, b, atol=5e-3)


class TestCellular2:
    def test_oracle(self):
        p = coords2()
        f1, f2 = jn.cellular2(p[:, 0].astype(np.float32), p[:, 1].astype(np.float32))
        w1, w2 = oracles.cellular2(p)
        assert_close(f1, w1, atol=1e-4)
        assert_close(f2, w2, atol=1e-4)

    def test_f1_le_f2(self):
        p = coords2(8192)
        f1, f2 = jn.cellular2(p[:, 0].astype(np.float32), p[:, 1].astype(np.float32))
        assert np.all(np.asarray(f1) <= np.asarray(f2) + 1e-7)
        assert np.all(np.asarray(f1) >= 0.0)
