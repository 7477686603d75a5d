"""Misc utilities — Helpers.Fill / PropMapper parity.

Reference: ``Helpers.Fill<T>`` (/root/reference/Utils/Helpers/helpers.cs:5-21,
a doubling array fill) and ``PropMapper`` (Utils/Helpers/PropMapper.cs:36-105,
a reflection-free property copier used to clone inspector configs).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


def match_vma(val, ref):
    """Cast replicated leaves of pytree ``val`` to carry the manual-mesh
    varying axes of ``ref`` (``jax.typeof(...).vma``).

    Inside ``shard_map``, ``lax.cond`` branch outputs must agree on which
    manual axes they vary over; a branch that returns a trace-time constant
    (replicated, vma=∅) where the other branch returns per-shard data
    (vma={axis}) fails to type-check.  This pcasts each ``val`` leaf up to
    ``ref``'s varying axes — a numerical no-op, and a complete no-op
    outside ``shard_map`` (vma=∅ everywhere there)."""
    want = jax.typeof(ref).vma

    def cast(leaf):
        missing = want - jax.typeof(leaf).vma
        if missing:
            return jax.lax.pcast(leaf, tuple(missing), to="varying")
        return leaf

    return jax.tree_util.tree_map(cast, val)


def fill(array, count: int, value):
    """Fill the first ``count`` entries of ``array`` with ``value``.
    (NumPy makes the reference's doubling loop a single slice store.)"""
    array[:count] = value
    return array


def copy_props(src: Any, dst: Any, only_shared: bool = True):
    """PropMapper analog: copy matching public fields between two config
    objects (dataclasses or plain attribute bags); returns dst (a new
    instance for frozen dataclasses)."""
    if dataclasses.is_dataclass(dst):
        names = {f.name for f in dataclasses.fields(dst)}
        updates = {}
        for n in names:
            if hasattr(src, n):
                updates[n] = getattr(src, n)
            elif not only_shared:
                raise AttributeError(f"source missing field {n!r}")
        return dataclasses.replace(dst, **updates)
    for n in vars(dst):
        if n.startswith("_"):
            continue
        if hasattr(src, n):
            setattr(dst, n, getattr(src, n))
        elif not only_shared:
            raise AttributeError(f"source missing field {n!r}")
    return dst
