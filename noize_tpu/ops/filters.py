"""Pointwise / reduction / remap filter ops.

Reference files:
  * constant ops  — ``ConstantMultiply``/``ConstantBinarize``
    (/root/reference/Filter/Operators/SimpleMutation.cs:16-54)
  * binary reduces — ``SubtractTiles``/``MultiplyTiles``/``MinTiles``/
    ``MaxTiles``/``RootSumSquaresTiles`` (SimpleMutation.cs:56-171),
    dispatched by ``ReduceStage`` (Filter/Reduce/ReduceStage.cs:12-63)
  * range scan + normalize — ``GetMapRangeJob``/``MapNormalizeValues``
    (Filter/NormalizeJob.cs:18-93) and ``NormalizeMap``
    (Geologic/FlowMap/FlowMapComponents.cs:150-173)
  * curve remap — ``CurveOperator`` (Filter/Curve/CurveJob.cs:56-89)
  * crop — ``CropJob`` (Filter/Sample/CropJob.cs:18-60)
  * fill — ``FillArrayJob`` (FlowMapComponents.cs:176-204)

All are pure elementwise/gather fns over ``float32[H, W]`` tiles; the serial
min/max scan of ``GetMapRangeJob`` becomes a tree reduction.
"""

from __future__ import annotations

import jax.numpy as jnp

_F32 = jnp.float32

# --- constant ops (SimpleMutation.cs:16-54) --------------------------------

def constant_multiply(a, value):
    return a * value


def constant_binarize(a, value):
    """1 where a >= value else 0 (SimpleMutation.cs:44)."""
    return jnp.where(a >= value, 1.0, 0.0).astype(a.dtype)


#: ConstantStage.ConstantOperationType parity (ConstantStage.cs:15-18).
CONSTANT_OPS = {"MULTIPLY": constant_multiply, "BINARIZE": constant_binarize}


# --- binary reduces (SimpleMutation.cs:56-171) -----------------------------

def subtract_tiles(a, b):
    return a - b


def multiply_tiles(a, b):
    return a * b


def min_tiles(a, b):
    return jnp.minimum(a, b)


def max_tiles(a, b):
    return jnp.maximum(a, b)


def root_sum_squares_tiles(a, b):
    return jnp.sqrt(a * a + b * b)


#: ReductionType enum parity (ReduceStage.cs:12-18).
REDUCTION_OPS = {
    "SUBTRACT": subtract_tiles,
    "MULTIPLY": multiply_tiles,
    "ROOTSUMSQUARES": root_sum_squares_tiles,
    "MAX": max_tiles,
    "MIN": min_tiles,
}


# --- range / normalize (NormalizeJob.cs:18-56, FlowMapComponents.cs:150-173)

def map_range(a, lim_min=jnp.inf, lim_max=-jnp.inf):
    """GetMapRangeJob: returns (min, max, range).  ``lim_min``/``lim_max``
    seed the scan (HIGHEST_MIN / LOWEST_MAX), so callers can force bounds."""
    mn = jnp.minimum(jnp.min(a), lim_min)
    mx = jnp.maximum(jnp.max(a), lim_max)
    return jnp.stack([mn, mx, mx - mn]).astype(_F32)


def normalize_map(a, args):
    """NormalizeMap.CalculateCell: (v - args[0]) / args[2]; if the range is
    below 1e-12 the *value* is zeroed first (then still divided — parity
    with FlowMapComponents.cs:160-164 which divides 0 by the tiny range)."""
    rng = args[2]
    v = jnp.where(rng < 1e-12, 0.0, a)
    return (v - args[0]) / rng


def normalize(a, lim_min=jnp.inf, lim_max=-jnp.inf):
    """Convenience: compute the range then map-normalize in one jit."""
    return normalize_map(a, map_range(a, lim_min, lim_max))


# --- curve remap (CurveJob.cs:56-89) ---------------------------------------

def curve_apply(a, curve):
    """LUT lerp with the reference's exact clamp/extrapolate quirks:
    rect = clamp(v,0,1)*N; lo = min(floor(rect), N-2); out = clamp01(lerp).
    At v == 1 the lerp factor is 2 (extrapolates past the last knot) before
    the final clamp — preserved (CurveJob.cs:72-79)."""
    n = curve.shape[0]
    rect = jnp.clip(a, 0.0, 1.0) * n
    lower = jnp.minimum(jnp.floor(rect), float(n - 2))
    li = lower.astype(jnp.int32)
    left = curve[li]
    right = curve[li + 1]
    value = left + (right - left) * (rect - lower)
    return jnp.clip(value, 0.0, 1.0)


def sample_curve(fn, samples=256):
    """CurveStage.ExtractCurve parity: curve[i] = fn(i / samples)
    (CurveStage.cs:26-34).  ``fn`` is any python callable or array."""
    import numpy as np

    return jnp.asarray(
        [float(fn(i / samples)) for i in range(samples)], _F32
    )


# --- crop (CropJob.cs:18-60) -----------------------------------------------

def crop(a, out_resolution: int, offset: int = 0):
    """Cut an ``out_resolution²`` window.  The reference job never assigns
    its ``Offset`` field (CropJob.cs:43-59), so the actual crop starts at
    (0, 0); pass ``offset=(in-out)//2`` for a centered crop."""
    return a[offset:offset + out_resolution, offset:offset + out_resolution]


def fill(shape, value):
    """FillArrayJob parity."""
    return jnp.full(shape, value, _F32)
