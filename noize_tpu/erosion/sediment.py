"""Sediment write-back: kernel dispersal + pile deposition.

Reference: ``FlowMaster.WriteSedimentMap`` / ``KernelDisperse`` / ``Place``
(/root/reference/Geologic/ParticleErosion/LiveErosionComponents.cs:98-184),
``ErodeHeightMaps`` (MultiThreadErosionJob.cs:438-480), ``PileSolver`` /
``ManhattanVertex`` (LiveErosionDataTypes.cs:1052-1228).

The reference drains a per-cell sediment-event queue *serially*: negative
or small deltas are stamped into the heightmap through a 5x5 separable
gaussian with clamped (edge-accumulating) indexing and a per-tap [0,1]
"bad build breaker" skip (LiveErosionComponents.cs:130-150); large positive
deltas go through the Manhattan-ring PileSolver.

TPU-first: all cells disperse at once.  A clamped-scatter gaussian stamp is
exactly a full correlation whose out-of-range margins are *folded* onto the
edge rows/columns (the adjoint of edge-clamped gather), and it is separable
because SafeIdx clamps each axis independently.  The [0,1] breaker is
applied per destination cell on the summed delta (the reference applies it
per tap in queue-drain order, which is nondeterministic hash-map order —
divergence noted).

PileSolver divergence (documented; SURVEY.md §7.5 sanctions this for v1):
the exact solver raises rings serially until the volume is placed; here
each pile is deposited as a mass-conserving Manhattan cone of radius
PILING_RADIUS (peak at the pile cell, linear falloff), which preserves
total mass and bounded support but not the exact ring-fill profile.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_F32 = jnp.float32

# ErodeHeightMaps kernel5 (MultiThreadErosionJob.cs:449-455; these are
# gaussian_taps(sigma≈1.1, 5) — kept verbatim for parity with KERNEL5 in
# LiveErosionComponents.cs:49)
KERNEL5 = np.array(
    [0.12007838424321349, 0.23388075658535032, 0.29208171834287244,
     0.23388075658535032, 0.12007838424321349],
    np.float32,
)
KERNEL3 = np.array(
    [0.30780132912347, 0.38439734175306006, 0.30780132912347], np.float32
)


def _disperse_axis(s, taps, axis: int):
    """Clamped-scatter 1-D dispersal: every source cell stamps taps at
    clamp(c+d); out-of-range taps accumulate on the edge cell."""
    k = len(taps)
    off = (k - 1) // 2
    n = s.shape[axis]
    s = jnp.moveaxis(s, axis, -1)
    ext = jnp.zeros(s.shape[:-1] + (n + 2 * off,), s.dtype)
    for i in range(k):
        ext = ext.at[..., i:i + n].add(s * taps[i])
    out = ext[..., off:off + n]
    if off > 0:
        out = out.at[..., 0].add(ext[..., :off].sum(-1))
        out = out.at[..., n - 1].add(ext[..., n + off:].sum(-1))
    return jnp.moveaxis(out, -1, axis)


def kernel_disperse(sed, taps=KERNEL5):
    """2-D separable clamped-scatter stamp (KernelDisperse parity for the
    sum over all cells; kernelFactor = kernel[x]·kernel[z])."""
    return _disperse_axis(_disperse_axis(sed, taps, 0), taps, 1)


def _manhattan_cone(radius: int) -> np.ndarray:
    """Normalized cone kernel: weight ∝ (radius − |dx|−|dz|)₊, peak center."""
    d = np.arange(-radius, radius + 1)
    man = np.abs(d)[:, None] + np.abs(d)[None, :]
    w = np.maximum(radius - man, 0.0).astype(np.float64)
    w[radius, radius] = radius  # ensure the peak dominates
    return (w / w.sum()).astype(np.float32)


_CONE_CACHE = {}


def pile_deposit(pile_map, radius: int):
    """Deposit each cell's pile volume as a Manhattan cone around it.

    ``pile_map`` holds the (positive) volumes of cells exceeding
    PILE_THRESHOLD; support is clamped at tile borders with edge folding so
    mass is conserved (the exact solver skips out-of-bounds verts instead —
    LiveErosionDataTypes.cs:1202-1207 — losing that mass; we keep it)."""
    import jax

    if radius not in _CONE_CACHE:
        _CONE_CACHE[radius] = _manhattan_cone(radius)
    cone = jnp.asarray(_CONE_CACHE[radius])
    r = radius
    h, w = pile_map.shape
    # full cross-correlation (cone is symmetric, so == convolution/scatter)
    full = jax.lax.conv_general_dilated(
        pile_map[None, None],
        cone[None, None],
        window_strides=(1, 1),
        padding=[(2 * r, 2 * r), (2 * r, 2 * r)],
    )[0, 0]  # full correlation: shape (h + 2r, w + 2r)
    # fold the out-of-range margins onto the edges (clamped-scatter adjoint)
    core = full[r:r + h, :]
    core = core.at[0, :].add(full[:r, :].sum(0))
    core = core.at[h - 1, :].add(full[r + h:, :].sum(0))
    out = core[:, r:r + w]
    out = out.at[:, 0].add(core[:, :r].sum(1))
    out = out.at[:, w - 1].add(core[:, r + w:].sum(1))
    return out


def write_sediment_map(height, sed_acc, params, height_scale):
    """ErodeHeightMaps + WriteSedimentMap parity split:

      delta < 0            → gaussian disperse (erosion carving)
      0 ≤ delta ≤ thresh   → gaussian disperse
      delta > thresh       → pile deposit

    with thresh = PILE_THRESHOLD / HEIGHT, then the [0,1] breaker.
    """
    import jax

    thresh = params.PILE_THRESHOLD / height_scale
    disperse_part = jnp.where(sed_acc <= thresh, sed_acc, 0.0)
    pile_part = jnp.where(sed_acc > thresh, sed_acc, 0.0)
    delta = kernel_disperse(disperse_part, KERNEL5)
    # piles are rare (a cell must accumulate > PILE_THRESHOLD metres in one
    # cycle); skip the wide cone convolution entirely when none exist
    delta = delta + jax.lax.cond(
        jnp.any(pile_part > 0.0),
        lambda p: pile_deposit(p, params.PILING_RADIUS),
        lambda p: jnp.zeros_like(p),
        pile_part,
    )
    new_height = height + delta
    # bad build breaker (LiveErosionComponents.cs:145-146)
    ok = (new_height >= 0.0) & (new_height <= 1.0)
    return jnp.where(ok, new_height, height)
