"""Edge-detection dispatch — the Filter/Kernel/Edge alternate path.

Reference: ``EdgeDetectionKernel`` tap tables and ``Edge1DFilter`` /
``Edge2DFilter`` (/root/reference/Filter/Kernel/Edge/EdgeDetection.cs:22-85,
EdgeJob.cs:10-47).  Same Sobel/Prewitt taps as SeparableKernelFilter, but
selectable by (algorithm, direction) and with the 2-D magnitude combining
the two 1-D passes by root-sum-squares."""

from __future__ import annotations

import jax.numpy as jnp

from .kernels import (
    _PREWITT3_HX, _PREWITT3_HZ, _PREWITT3_VX, _PREWITT3_VZ,
    _SOBEL3_HX, _SOBEL3_HZ, _SOBEL3_VX, _SOBEL3_VZ,
    separable_series,
)

EDGE_ALGORITHMS = ("SOBEL", "PREWITT")
EDGE_DIRECTIONS = ("HORIZONTAL", "VERTICAL")

_KERNELS = {
    ("SOBEL", "HORIZONTAL"): (_SOBEL3_HX, _SOBEL3_HZ),
    ("SOBEL", "VERTICAL"): (_SOBEL3_VX, _SOBEL3_VZ),
    ("PREWITT", "HORIZONTAL"): (_PREWITT3_HX, _PREWITT3_HZ),
    ("PREWITT", "VERTICAL"): (_PREWITT3_VX, _PREWITT3_VZ),
}


def edge_1d(a, algorithm: str = "SOBEL", direction: str = "HORIZONTAL"):
    """Edge1DFilter.Schedule: one separable X/Z series with the selected
    taps (EdgeJob.cs:11-20)."""
    try:
        tx, tz = _KERNELS[(algorithm, direction)]
    except KeyError:
        raise ValueError(
            f"unknown edge kernel ({algorithm!r}, {direction!r}); "
            f"algorithms {EDGE_ALGORITHMS}, directions {EDGE_DIRECTIONS}"
        )
    return separable_series(a, tx, tz, 1.0)


def edge_2d(a, algorithm: str = "SOBEL"):
    """Edge2DFilter.Schedule: H and V passes on the same input combined by
    √(H² + V²) (EdgeJob.cs:33-37 → ScheduleReduce<RootSumSquaresTiles>)."""
    h = edge_1d(a, algorithm, "HORIZONTAL")
    v = edge_1d(a, algorithm, "VERTICAL")
    return jnp.sqrt(h * h + v * v)
