"""Compute kernels ("ops"): noise, filters, geologic, mesh — SURVEY.md L2.

Convenience re-exports of the op-level API; stages in
``noize_tpu.pipeline.stages`` wrap these with the reference's parameter
surfaces.
"""

from . import blur, edge, filters, flow, fractal, kernels, mesh, noise, thermal  # noqa: F401
from .fractal import NOISE_TYPES  # noqa: F401
from .fractal import fractal as fractal_noise  # noqa: F401  (module name stays `fractal`)
from .kernels import (  # noqa: F401
    KERNEL_FILTER_TYPES, gaussian_taps, kernel_filter, sobel2d, value_erosion,
)
from .blur import gauss_blur, smooth_blur  # noqa: F401
from .flow import flow_map  # noqa: F401
from .thermal import thermal_erosion  # noqa: F401
from .mesh import heightmap_mesh, heightmap_mesh_overshoot, square_planar_mesh  # noqa: F401
