"""Row-block selection shared by the manual-DMA pallas kernels.

Every fused kernel grids over full-width row blocks with a halo; the block
must divide the (half-)row count, cover the halo (validity shrink), and —
for wide fields — keep one VMEM window small enough that the kernel body's
working set stays under the raised Mosaic VMEM limit.  Centralizing the
choice also turns the former bare ``StopIteration`` from an exhausted
generator into a diagnosable error (advisor finding, round 2).
"""

from __future__ import annotations

_CANDIDATES = (256, 128, 64, 32, 16, 8)

# One (block + 2·halo, cols) f32 window per live buffer; kernel bodies keep
# roughly 8-12 windows live, so 6 MB/window targets a ≲70 MB working set —
# inside the 100 MB raised VMEM limit with headroom for Mosaic spills.
_WINDOW_BYTES_CAP = 6 * 1024 * 1024


def pick_block(n_rows: int, halo: int, cols: int = None,
               cap_bytes: int = _WINDOW_BYTES_CAP,
               candidates=_CANDIDATES) -> int:
    """Largest candidate block that divides ``n_rows``, covers ``halo``,
    and (when ``cols`` is given) keeps a (block + 2·halo, cols) f32 window
    under ``cap_bytes``.  Raises a descriptive ValueError when no candidate
    qualifies (e.g. n_rows not a multiple of 8, or too many fused phases).

    block ≥ halo is required for boundary CORRECTNESS, not just validity
    shrink: a block whose window reaches past the global edge would read
    statically edge-replicated padding without re-applying the
    per-iteration clamp fixup (only first/last blocks do that), silently
    skewing border results — measured as ~0.5% drift in a block<halo
    probe.  Kernels that hit the cap should shrink their per-launch fused
    depth instead (see stencil._rows_plan)."""
    for b in candidates:
        if n_rows % b != 0 or b < halo:
            continue
        if cols is not None and (b + 2 * halo) * cols * 4 > cap_bytes:
            continue
        return b
    raise ValueError(
        f"no pallas row block fits: n_rows={n_rows}, halo={halo}"
        + (f", cols={cols}, cap={cap_bytes}B/window" if cols else "")
        + f"; candidates {candidates} must divide n_rows and cover the halo"
        " — reduce phases_per_launch/iterations, pad the field to a"
        " multiple of 8 rows, or use the XLA path"
    )
