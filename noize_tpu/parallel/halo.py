"""ICI halo exchange for 2-D spatially sharded grids.

Replaces the reference's margin-overlap recompute (GENERATOR_RES =
TILE_RES + 2·margin — MeshTileGenerator.cs:166-169): instead of every tile
regenerating a margin band, shards exchange edge strips over ICI with
``lax.ppermute`` inside ``shard_map``.

Boundary semantics: shards at the global border replicate their own edge
strip, so a sharded stencil is *bit-identical* to the single-device op with
edge-clamped indexing (TileData.cs:72-77 semantics) — tested in
tests/test_parallel.py.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _edge_strip(block, dim: int, take: int, from_start: bool):
    idx = [slice(None)] * block.ndim
    idx[dim] = slice(0, take) if from_start else slice(block.shape[dim] - take, None)
    return block[tuple(idx)]


def exchange_axis(block, halo: int, axis_name: str, dim: int):
    """Extend ``block`` by ``halo`` cells on both sides of ``dim`` with
    neighbor data along mesh axis ``axis_name`` (edge-replicated at the
    global border).  Must run inside shard_map."""
    n = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    send_to_next = _edge_strip(block, dim, halo, from_start=False)
    send_to_prev = _edge_strip(block, dim, halo, from_start=True)
    if n > 1:
        fwd = [(k, k + 1) for k in range(n - 1)]
        bwd = [(k, k - 1) for k in range(1, n)]
        from_prev = lax.ppermute(send_to_next, axis_name, fwd)
        from_next = lax.ppermute(send_to_prev, axis_name, bwd)
    else:
        from_prev = jnp.zeros_like(send_to_prev)
        from_next = jnp.zeros_like(send_to_next)
    # global-border shards replicate their own edge (clamp semantics)
    own_first = _edge_strip(block, dim, 1, from_start=True)
    own_last = _edge_strip(block, dim, 1, from_start=False)
    reps = [1] * block.ndim
    reps[dim] = halo
    from_prev = jnp.where(i == 0, jnp.tile(own_first, reps), from_prev)
    from_next = jnp.where(i == n - 1, jnp.tile(own_last, reps), from_next)
    return jnp.concatenate([from_prev, block, from_next], axis=dim)


def exchange_2d(block, halo: int, axis_row: str = "x", axis_col: str = "y"):
    """Full 2-D halo (rows then columns — the second pass carries the
    already-widened strips, so corners arrive correctly)."""
    block = exchange_axis(block, halo, axis_row, dim=0)
    return exchange_axis(block, halo, axis_col, dim=1)


def _crop(block, halo: int):
    return block[halo:block.shape[0] - halo, halo:block.shape[1] - halo]


def sharded_stencil(fn: Callable, halo: int, mesh: Mesh,
                    axis_row: str = "x", axis_col: str = "y"):
    """Lift a local stencil ``fn(extended_block) -> extended_block`` (edge
    semantics, receptive field ≤ halo) to a sharded field op.

    The wrapped function takes/returns a global (H, W) array sharded
    P(axis_row, axis_col).
    """
    spec = P(axis_row, axis_col)

    @partial(
        shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False,
    )
    def wrapped(block):
        ext = exchange_2d(block, halo, axis_row, axis_col)
        out = fn(ext)
        return _crop(out, halo)

    return wrapped
