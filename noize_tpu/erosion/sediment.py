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
    clamp(c+d); out-of-range taps accumulate on the edge cell.

    Formulated as zero-fill shifted adds (symmetric taps ⇒ scatter ==
    correlation) plus closed-form edge folds — overlapping
    dynamic-update-slice accumulation serializes badly on TPU."""
    taps = np.asarray(taps, np.float32)
    k = len(taps)
    off = (k - 1) // 2
    n = s.shape[axis]
    s = jnp.moveaxis(s, axis, -1)
    zpad = jnp.pad(s, [(0, 0)] * (s.ndim - 1) + [(off, off)])
    out = None
    for i in range(k):
        piece = zpad[..., i:i + n] * taps[k - 1 - i]
        out = piece if out is None else out + piece
    if off > 0:
        # fold: source col j (< off) sends Σ_{i<off-j} taps[i] to col 0
        t_lo = np.cumsum(taps)            # t_lo[m] = Σ_{i<=m} taps[i]
        for j in range(off):
            w_lo = float(t_lo[off - j - 1])
            out = out.at[..., 0].add(s[..., j] * w_lo)
            out = out.at[..., n - 1].add(s[..., n - 1 - j] * w_lo)
    return jnp.moveaxis(out, -1, axis)


def kernel_disperse(sed, taps=KERNEL5):
    """2-D separable clamped-scatter stamp (KernelDisperse parity for the
    sum over all cells; kernelFactor = kernel[x]·kernel[z])."""
    return _disperse_axis(_disperse_axis(sed, taps, 0), taps, 1)


def _triangle_taps(radius: int) -> np.ndarray:
    """Normalized 1-D triangle taps (radius − |d|)₊ with an emphasized
    peak — the separable factor of the pile profile."""
    d = np.arange(-radius, radius + 1)
    w = np.maximum(radius - np.abs(d), 0.0).astype(np.float64)
    w[radius] = radius
    return (w / w.sum()).astype(np.float32)


_TENT_CACHE = {}


def pile_deposit(pile_map, radius: int):
    """Deposit each cell's pile volume as a separable tent (triangle ⊗
    triangle) of radius PILING_RADIUS around it.

    ``pile_map`` holds the (positive) volumes of cells exceeding
    PILE_THRESHOLD; support is clamped at tile borders with edge folding so
    mass is conserved (the exact solver skips out-of-bounds verts instead —
    LiveErosionDataTypes.cs:1202-1207 — losing that mass; we keep it).

    Profile note (PARITY.md D3): the exact solver's serial ring fill is
    approximated by a peaked bounded-support deposit; the separable tent
    replaces an earlier Manhattan cone — a dense (2r+1)² convolution costs
    ~850ms at 2048² on TPU, two 1-D passes ~1ms."""
    if radius not in _TENT_CACHE:
        _TENT_CACHE[radius] = _triangle_taps(radius)
    taps = _TENT_CACHE[radius]
    return _disperse_axis(_disperse_axis(pile_map, taps, 0), taps, 1)


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
