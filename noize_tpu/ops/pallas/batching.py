"""vmap support for manual-DMA pallas kernels.

Kernels that take HBM references (``memory_space=ANY``) with explicit
windowed async copies cannot be batched by pallas' vmap rule (the batched
block spec is no longer trivial and the Mosaic lowering rejects it).
``sequential_vmap`` gives such a kernel a custom batching rule that maps
the un-batched kernel over the batch axis with ``lax.map`` — on a single
chip the kernels saturate the core per call anyway, so sequential per-tile
execution IS the batched execution, and ``tile_batch``/`vmap` users
compose transparently.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sequential_vmap(f):
    """Wrap ``f(*arrays) -> pytree`` so vmap lowers to a sequential
    ``lax.map`` over the batch axis (unbatched args are broadcast)."""
    vf = jax.custom_batching.custom_vmap(f)

    @vf.def_vmap
    def _rule(axis_size, in_batched, *args):
        flat_args, treedef = jax.tree_util.tree_flatten(args)
        flat_b, _ = jax.tree_util.tree_flatten(in_batched)
        # only batched operands ride the map; unbatched ones close over
        # the body (no axis_size-fold broadcast materialized in HBM)
        mapped = tuple(a for a, b in zip(flat_args, flat_b) if b)

        def body(xs):
            it = iter(xs)
            flat = [next(it) if b else a
                    for a, b in zip(flat_args, flat_b)]
            return f(*jax.tree_util.tree_unflatten(treedef, flat))

        out = jax.lax.map(body, mapped)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return vf
