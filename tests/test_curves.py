"""Unity AnimationCurve evaluator oracle tests.

Oracle: for UNWEIGHTED tangents the Hermite segment equals the cubic
Bezier whose inner control points sit at one-third spans
(P1 = (t0 + dt/3, v0 + m0·dt/3), P2 = (t1 − dt/3, v1 − m1·dt/3)); with
equally-spaced x control points the x-cubic degenerates to x(u) = t0 + dt·u,
so de Casteljau with u = (t − t0)/dt is an independent evaluation path.
"""

import numpy as np
import pytest

from noize_tpu.utils.anim_curve import (
    Keyframe, evaluate, sample_lut, parse_unity_curve,
)
from noize_tpu.app.presets import (
    INVERT_KEYS, CURVE_BOOST_CONTRAST_KEYS, INVERT, CURVE_BOOST_CONTRAST,
)


def bezier_oracle(keys, t):
    """Independent de Casteljau evaluation (unweighted keys only)."""
    ks = sorted(keys, key=lambda k: k.time)
    if t <= ks[0].time:
        return ks[0].value
    if t >= ks[-1].time:
        return ks[-1].value
    for k0, k1 in zip(ks, ks[1:]):
        if k0.time <= t <= k1.time:
            break
    dt = k1.time - k0.time
    u = (t - k0.time) / dt
    p = [
        k0.value,
        k0.value + k0.out_slope * dt / 3.0,
        k1.value - k1.in_slope * dt / 3.0,
        k1.value,
    ]
    for level in range(3):
        p = [(1 - u) * a + u * b for a, b in zip(p, p[1:])]
    return p[0]


class TestEvaluate:
    @pytest.mark.parametrize("keys", [INVERT_KEYS, CURVE_BOOST_CONTRAST_KEYS])
    def test_passes_through_keyframes(self, keys):
        for k in keys:
            np.testing.assert_allclose(evaluate(keys, k.time), k.value,
                                       atol=1e-7)

    @pytest.mark.parametrize("keys", [INVERT_KEYS, CURVE_BOOST_CONTRAST_KEYS])
    def test_matches_bezier_oracle(self, keys):
        ts = np.linspace(-0.1, 1.1, 487)
        got = evaluate(keys, ts)
        want = np.asarray([bezier_oracle(keys, float(t)) for t in ts])
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_clamp_outside_range(self):
        keys = (Keyframe(0.2, 3.0, 1.0, 1.0), Keyframe(0.8, 7.0, -2.0, -2.0))
        assert evaluate(keys, -5.0) == 3.0
        assert evaluate(keys, 0.0) == 3.0
        assert evaluate(keys, 99.0) == 7.0

    def test_infinite_slope_is_step(self):
        keys = (
            Keyframe(0.0, 1.0, 0.0, float("inf")),
            Keyframe(1.0, 5.0, float("inf"), 0.0),
        )
        np.testing.assert_allclose(evaluate(keys, 0.5), 1.0)
        np.testing.assert_allclose(evaluate(keys, 0.999), 1.0)
        np.testing.assert_allclose(evaluate(keys, 1.0), 5.0)

    def test_empty_and_single(self):
        assert evaluate((), 0.4) == 0.0
        assert evaluate((Keyframe(0.3, 2.5),), 0.9) == 2.5

    def test_weighted_segment_matches_brute_force(self):
        # weighted out-tangent: x-cubic is genuinely cubic; verify the
        # bisection parameter solve against dense forward sampling
        k0 = Keyframe(0.0, 0.0, 0.0, 2.0, weighted_mode=2, out_weight=0.1)
        k1 = Keyframe(1.0, 1.0, 0.5, 0.0, weighted_mode=1, in_weight=0.4)
        keys = (k0, k1)
        us = np.linspace(0.0, 1.0, 20001)
        wo, wi = 0.1, 0.4
        x = ((1 - us) ** 3 * 0.0 + 3 * (1 - us) ** 2 * us * wo
             + 3 * (1 - us) * us ** 2 * (1 - wi) + us ** 3 * 1.0)
        y = ((1 - us) ** 3 * 0.0 + 3 * (1 - us) ** 2 * us * (wo * 2.0)
             + 3 * (1 - us) * us ** 2 * (1.0 - wi * 0.5) + us ** 3 * 1.0)
        for t in (0.05, 0.3, 0.6, 0.95):
            want = np.interp(t, x, y)
            np.testing.assert_allclose(evaluate(keys, t), want, atol=1e-5)

    def test_parse_unity_curve(self):
        txt = """
    - serializedVersion: 3
      time: 0
      value: 0
      inSlope: -0.2922248
      outSlope: Infinity
      tangentMode: 34
      weightedMode: 0
      inWeight: 0
      outWeight: 0.33333334
    - serializedVersion: 3
      time: 0.05752933
      value: -0.016811498
      inSlope: 0.7459431
      outSlope: 0.7459431
      tangentMode: 0
      weightedMode: 3
      inWeight: 0.33333334
      outWeight: 0.2998635
"""
        keys = parse_unity_curve(txt)
        assert len(keys) == 2
        assert keys[0].in_slope == pytest.approx(-0.2922248)
        assert keys[0].out_slope == float("inf")
        assert keys[1].weighted_mode == 3
        assert keys[1].out_weight == pytest.approx(0.2998635)


class TestPresetCurves:
    def test_lut_shape_and_endpoints(self):
        assert len(INVERT.curve) == 256
        assert len(CURVE_BOOST_CONTRAST.curve) == 256
        # Evaluate(0) passes through the first key exactly
        assert INVERT.curve[0] == 0.0
        assert CURVE_BOOST_CONTRAST.curve[0] == 0.0

    def test_lut_matches_direct_evaluation(self):
        lut = sample_lut(INVERT_KEYS, 256)
        for i in (0, 17, 128, 255):
            np.testing.assert_allclose(
                lut[i], evaluate(INVERT_KEYS, i / 256), atol=0
            )
