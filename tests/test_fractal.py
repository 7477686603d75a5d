"""Fractal (NoiseStage) op tests: normalization, seams, oracle parity."""

import numpy as np
import pytest

from noize_tpu.ops import fractal as fr
from noize_tpu.ops import noise as jn

import oracles


def tile(res=64, **kw):
    return np.asarray(fr.fractal(res, kw.pop("xpos", 0), kw.pop("zpos", 0), **kw))


class TestFractal:
    def test_layout_and_single_octave(self):
        """octaves=1, hurst=0 → output equals the rectified basis at world coords."""
        res = 32
        t = tile(res, noise_type="Perlin", octaves=1, noise_size=100.0)
        x = np.arange(res, dtype=np.float64) / 100.0
        want = oracles.cnoise2(
            np.stack(np.meshgrid(x, x, indexing="xy"), -1)
        )  # rows=z, cols=x
        want = (1.0 + want) / 2.0
        np.testing.assert_allclose(t, want, atol=5e-4)

    def test_world_space_seamless(self):
        """Adjacent tiles must agree on their overlap (global noise domain)."""
        res = 64
        a = tile(res, noise_type="Simplex", octaves=5, hurst=0.4, noise_size=170.0)
        b = np.asarray(
            fr.fractal(res, 32, 0, noise_type="Simplex", octaves=5, hurst=0.4, noise_size=170.0)
        )
        np.testing.assert_allclose(a[:, 32:], b[:, :32], atol=1e-6)
        c = np.asarray(
            fr.fractal(res, 0, 16, noise_type="Simplex", octaves=5, hurst=0.4, noise_size=170.0)
        )
        np.testing.assert_allclose(a[16:, :], c[:48, :], atol=1e-6)

    def test_norm_value(self):
        # CalcFractalNormValue parity: sum of exp2(-hurst)^i
        assert fr.fractal_norm_value(0.0, 4) == 4.0
        g = 2 ** (-0.4)
        np.testing.assert_allclose(
            fr.fractal_norm_value(0.4, 13), sum(g ** i for i in range(13))
        )

    @pytest.mark.parametrize("kind", fr.NOISE_TYPES)
    def test_all_bases_finite_and_bounded(self, kind):
        t = tile(48, noise_type=kind, octaves=3, hurst=0.5, noise_size=37.0)
        assert np.all(np.isfinite(t))
        # all rectified bases land roughly in [0, 1]; fBm normalization keeps it there
        assert t.min() > -0.3 and t.max() < 1.8

    def test_detune_changes_field(self):
        a = tile(32, noise_type="Perlin", octaves=6, detune_rate=0.0)
        b = tile(32, noise_type="Perlin", octaves=6, detune_rate=0.04)
        assert np.max(np.abs(a - b)) > 1e-4

    def test_deterministic(self):
        a = tile(32, noise_type="Cellular", octaves=4)
        b = tile(32, noise_type="Cellular", octaves=4)
        np.testing.assert_array_equal(a, b)

    def test_readme_example_params(self):
        """README example #1: simplex, hurst .4, 13 octaves, noiseSize 1700."""
        t = tile(
            128, noise_type="Simplex", octaves=13, hurst=0.4,
            stepdown=2.0, detune_rate=0.0, noise_size=1700.0,
        )
        assert np.all(np.isfinite(t))
        assert 0.0 < t.mean() < 1.0
