"""Filter-suite tests vs direct clamped-index NumPy oracles.

Oracles below re-implement the reference job formulas with explicit loops /
clamped indexing (KernelOperators.cs, SimpleMutation.cs, CurveJob.cs,
NormalizeJob.cs, CropJob.cs, ThermalErosionFilter.cs), independent of the
vectorized JAX path.
"""

import numpy as np
import pytest

from noize_tpu.ops import kernels as K
from noize_tpu.ops import blur as B
from noize_tpu.ops import filters as F
from noize_tpu.ops import thermal as T

RNG = np.random.default_rng(7)


def rand_tile(res=33):
    return RNG.uniform(0.0, 1.0, size=(res, res)).astype(np.float32)


def np_conv_x(a, taps, factor=1.0):
    """KernelSampleXOperator (KernelOperators.cs:32-41)."""
    res = a.shape[1]
    off = (len(taps) - 1) // 2
    out = np.zeros_like(a)
    for d in range(-off, off + 1):
        xi = np.clip(np.arange(res) + d, 0, res - 1)
        out += a[:, xi] * taps[off + d]
    return out * factor


def np_conv_z(a, taps, factor=1.0):
    """KernelSampleZOperator — flipped indexing (KernelOperators.cs:58-65)."""
    res = a.shape[0]
    off = (len(taps) - 1) // 2
    out = np.zeros_like(a)
    for d in range(off, -off - 1, -1):
        zi = np.clip(np.arange(res) + d, 0, res - 1)
        out += a[zi, :] * taps[off - d]
    return out * factor


def np_min_x(a, size):
    """KernelMinXOperator — window [-off, off) (KernelOperators.cs:83-91)."""
    res = a.shape[1]
    off = (size - 1) // 2
    out = np.full_like(a, np.finfo(np.float32).max)
    for d in range(-off, off):
        xi = np.clip(np.arange(res) + d, 0, res - 1)
        out = np.minimum(out, a[:, xi])
    return out


def np_min_z(a, size):
    res = a.shape[0]
    off = (size - 1) // 2
    out = np.full_like(a, np.finfo(np.float32).max)
    for d in range(-off, off):
        zi = np.clip(np.arange(res) + d, 0, res - 1)
        out = np.minimum(out, a[zi, :])
    return out


class TestSeparableKernels:
    def test_conv_x_oracle(self):
        a = rand_tile()
        taps = K.gaussian_taps(1.0, 5)
        np.testing.assert_allclose(
            np.asarray(K.conv_x(a, taps)), np_conv_x(a, taps), atol=1e-6
        )

    def test_conv_z_flip_quirk(self):
        """Z pass must apply asymmetric kernels flipped vs the X pass."""
        a = rand_tile()
        taps = np.array([-1.0, 0.0, 1.0], np.float32)
        got = np.asarray(K.conv_z(a, taps))
        np.testing.assert_allclose(got, np_conv_z(a, taps), atol=1e-6)
        # and it is genuinely the flip of the naive orientation
        naive = np_conv_x(a.T, taps).T
        assert np.max(np.abs(got - naive)) > 1e-3

    def test_gauss_taps_match_reference_table(self):
        # SeparableKernelFilter.gauss5_s1 / gauss3_s2 published constants
        np.testing.assert_allclose(
            K.gaussian_taps(1.0, 5),
            [0.054488684549642945, 0.24420134200323337, 0.4026199468942475,
             0.24420134200323337, 0.054488684549642945],
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            K.gaussian_taps(2.0, 3),
            [0.3191677684538592, 0.36166446309228156, 0.3191677684538592],
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            K.gaussian_taps(1.0, 9)[0], 0.00013383062461474178, rtol=1e-5
        )

    def test_smooth3_preserves_mean_roughly(self):
        a = rand_tile(64)
        out = np.asarray(K.kernel_filter(a, "Smooth3"))
        assert abs(out.mean() - a.mean()) < 0.01
        assert out.std() < a.std()

    def test_gauss_iterations(self):
        a = rand_tile(64)
        one = np.asarray(K.kernel_filter(a, "Gauss5_S1", 1))
        seventeen = np.asarray(K.kernel_filter(a, "Gauss5_S1", 17))
        assert seventeen.std() < one.std() < a.std()

    def test_sobel2d_oracle(self):
        a = rand_tile()
        hx = np_conv_z(np_conv_x(a, [-1, 0, 1]), [1, 2, 1])
        vx = np_conv_z(np_conv_x(a, [1, 2, 1]), [1, 0, -1])
        want = np.sqrt(hx * hx + vx * vx)
        np.testing.assert_allclose(np.asarray(K.sobel2d(a)), want, atol=1e-5)

    def test_min_filter_asymmetric_window(self):
        a = rand_tile()
        got = np.asarray(K.value_erosion(a, 3))
        want = np_min_z(np_min_x(a, 3), 3)
        np.testing.assert_array_equal(got, want)
        # 3-wide min looks at offsets {-1, 0} only (reference quirk)
        assert not np.array_equal(got, np_min_z(np_min_x(a[:, ::-1], 3), 3)[:, ::-1])


class TestBlur:
    def test_limit_width(self):
        assert B.limit_width(4) == 5
        assert B.limit_width(2) == 3
        assert B.limit_width(99) == 25
        assert B.limit_width(1) == 3

    def test_gauss_blur_matches_series(self):
        a = rand_tile()
        got = np.asarray(B.gauss_blur(a, 5, "s1d00"))
        want = np.asarray(K.kernel_filter(a, "Gauss5_S1"))
        np.testing.assert_allclose(got, want, atol=1e-7)

    def test_smooth_blur_box(self):
        a = rand_tile()
        got = np.asarray(B.smooth_blur(a, 3))
        want = np_conv_z(np_conv_x(a, [1 / 3] * 3), [1 / 3] * 3)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_sigma_names(self):
        assert B.GAUSS_SIGMA_NAMES[0] == "s0d50"
        assert B.GAUSS_SIGMA_NAMES[15] == "s8d00"
        assert B.sigma_value("s2d50") == 2.5


def np_thermal(data, talus, inc, ratio, iterations):
    """Direct loop transcription of ThermalErosionFilter (per-block serial)."""
    res = data.shape[0]
    d = data.copy()
    talus_rad = (talus / 90.0) * 3.14159 / 2.0
    max_diff = (np.tan(talus_rad) * ratio) / res

    def rect(i1, i2):
        diff = abs(d[i1] - d[i2])
        if diff > max_diff:
            excess = diff - max_diff
            if d[i1] > d[i2]:
                d[i2] += inc * excess
                d[i1] -= inc * excess
            else:
                d[i1] += inc * excess
                d[i2] -= inc * excess

    for _ in range(iterations):
        for flip in range(4):
            for job_z in range(res // 2 - 1):
                offset = 1 + (1 if flip % 2 != 0 else 0)
                z = (job_z + 1) * 2
                if flip > 1:
                    z -= 1
                x = offset
                while x < res - 1:
                    idx = [(z, x), (z, x + 1), (z + 1, x), (z + 1, x + 1)]
                    for a, b in ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)):
                        rect(idx[a], idx[b])
                    x += 2
    return d


class TestThermal:
    def test_oracle_one_iteration(self):
        a = rand_tile(16)
        got = np.asarray(T.thermal_erosion(a, 45.0, 0.5, 1.0, iterations=1))
        want = np_thermal(a, 45.0, 0.5, 1.0, 1)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_oracle_three_iterations(self):
        a = (rand_tile(12) * 3).astype(np.float32)
        got = np.asarray(T.thermal_erosion(a, 30.0, 0.6, 2.0, iterations=3))
        want = np_thermal(a, 30.0, 0.6, 2.0, 3)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_mass_conserved(self):
        a = rand_tile(64)
        out = np.asarray(T.thermal_erosion(a, 40.0, 0.6, 1.0, iterations=4))
        np.testing.assert_allclose(out.sum(), a.sum(), rtol=1e-5)

    def test_slopes_reduced(self):
        a = rand_tile(64) * 5
        out = np.asarray(T.thermal_erosion(a, 30.0, 0.9, 1.0, iterations=8))
        inner = slice(1, -1)
        gx = np.abs(np.diff(a, axis=1))[inner, inner]
        gx2 = np.abs(np.diff(out, axis=1))[inner, inner]
        assert gx2.mean() < gx.mean()


class TestPointwise:
    def test_constant_ops(self):
        a = rand_tile()
        np.testing.assert_allclose(np.asarray(F.constant_multiply(a, 0.3)), a * 0.3)
        got = np.asarray(F.constant_binarize(a, 0.5))
        np.testing.assert_array_equal(got, (a >= 0.5).astype(np.float32))

    def test_reductions(self):
        a, b = rand_tile(), rand_tile()
        np.testing.assert_allclose(np.asarray(F.subtract_tiles(a, b)), a - b)
        np.testing.assert_allclose(np.asarray(F.multiply_tiles(a, b)), a * b)
        np.testing.assert_allclose(np.asarray(F.min_tiles(a, b)), np.minimum(a, b))
        np.testing.assert_allclose(np.asarray(F.max_tiles(a, b)), np.maximum(a, b))
        np.testing.assert_allclose(
            np.asarray(F.root_sum_squares_tiles(a, b)),
            np.sqrt(a * a + b * b), atol=1e-7,
        )

    def test_map_range_and_normalize(self):
        a = rand_tile() * 4 - 1
        args = np.asarray(F.map_range(a))
        np.testing.assert_allclose(args, [a.min(), a.max(), a.max() - a.min()], rtol=1e-6)
        out = np.asarray(F.normalize(a))
        assert abs(out.min()) < 1e-6 and abs(out.max() - 1) < 1e-6

    def test_normalize_zero_range(self):
        # Parity quirk (FlowMapComponents.cs:160-164): below-epsilon range
        # zeroes the value but still divides → (0 - min) / 0 = -inf for a
        # positive constant map.  Preserved, not "fixed".
        a = np.full((8, 8), 0.7, np.float32)
        out = np.asarray(F.normalize(a))
        assert np.all(np.isneginf(out))

    def test_curve_apply(self):
        curve = np.linspace(0, 1, 256).astype(np.float32) ** 2
        a = rand_tile()
        got = np.asarray(F.curve_apply(a, curve))
        # oracle: CurveOperator.Apply loop
        n = 256
        rect = np.clip(a, 0, 1) * n
        lower = np.minimum(np.floor(rect), n - 2)
        li = lower.astype(int)
        want = curve[li] + (curve[li + 1] - curve[li]) * (rect - lower)
        want = np.clip(want, 0, 1)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_curve_extrapolation_quirk(self):
        # v == 1 → lerp factor 2 past the last knot, then clamped
        curve = np.array([0.0, 0.1, 0.2, 0.4], np.float32)
        got = np.asarray(F.curve_apply(np.array([[1.0]], np.float32), curve)).item()
        # rect=4, lower=2, frac=2 → 0.2 + (0.4-0.2)*2 = 0.6 → clamp → 0.6
        np.testing.assert_allclose(got, 0.6, atol=1e-6)

    def test_crop(self):
        a = rand_tile(16)
        np.testing.assert_array_equal(np.asarray(F.crop(a, 8)), a[:8, :8])
        np.testing.assert_array_equal(np.asarray(F.crop(a, 8, 4)), a[4:12, 4:12])
