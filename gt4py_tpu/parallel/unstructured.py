"""Distributed unstructured meshes with EXPLICIT ghost rows.

The GSPMD path (``parallel/next_fields.py``) lets XLA partition
connectivity gathers however it likes — correct, but an irregular gather
over a sharded codomain generally lowers to all-gathers. Real ICON-style
consumers partition the mesh so each rank owns a contiguous, spatially
compact block of every element kind and REMOTE accesses touch only a thin
halo owned by ring neighbors; the exchange is then two fixed-width slab
sends per axis step (reference has nothing here — gt4py delegates
distribution to GHEX; SURVEY.md §2.6 "connectivity tables become sharded
gather indices").

TPU-native recipe (composes ``next/mesh_utils.py`` renumbering with a 1-D
device ring):

1. :func:`ring_partition` — contiguous equal blocks of each element kind
   (apply ``mesh_utils.spatial_renumbering`` FIRST so contiguous id
   blocks are spatially compact and ghosts land on ring neighbors).
2. :func:`partition_gather` — per-shard LOCAL connectivity tables whose
   stored indices address a shard-extended value buffer
   ``[lo-halo | owned | hi-halo]``; halo widths are uniform across
   shards (SPMD), computed from the worst shard.
3. :func:`halo_gather` — inside ``shard_map``: two ``lax.ppermute`` slab
   exchanges over the ring (ICI collective-permutes, never all-gather),
   concatenation, then the ordinary local gather.

Plan-time validation rejects meshes whose ghosts reach beyond the
immediate ring neighbors (raise, never silently widen) — renumber first.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

__all__ = [
    "ring_partition",
    "partition_gather",
    "halo_gather",
    "ShardedGather",
]


def ring_partition(n_elements: int, n_parts: int) -> np.ndarray:
    """Block starts of a contiguous equal partition: part p owns
    ``[starts[p], starts[p+1])``. Requires ``n_parts`` to divide
    ``n_elements`` (uniform SPMD block shapes)."""
    if n_elements % n_parts != 0:
        raise ValueError(
            f"{n_elements} elements do not split evenly over {n_parts} parts"
        )
    w = n_elements // n_parts
    return np.arange(n_parts + 1) * w


class ShardedGather:
    """Per-shard gather plan produced by :func:`partition_gather`.

    Attributes:
        local_tables: (n_rows, deg) int32 — global row order, values are
            LOCAL indices into the shard-extended buffer of the owning
            row shard. Shard it by rows (axis 0) on the same mesh axis
            as the values.
        halo_lo / halo_hi: uniform slab widths pulled from the previous /
            next ring neighbor.
        n_local: owned values per shard.
    """

    def __init__(self, local_tables, halo_lo, halo_hi, n_local, n_parts):
        self.local_tables = local_tables
        self.halo_lo = int(halo_lo)
        self.halo_hi = int(halo_hi)
        self.n_local = int(n_local)
        self.n_parts = int(n_parts)


def partition_gather(
    table: np.ndarray,
    n_values: int,
    n_parts: int,
    *,
    skip_value: Optional[int] = None,
) -> ShardedGather:
    """Build the explicit-ghost plan for ``values[table]`` with rows and
    values both ring-partitioned into ``n_parts`` contiguous blocks.

    For each row shard p (owning rows ``[p*Rw, (p+1)*Rw)`` and values
    ``[p*Vw, (p+1)*Vw)``), every referenced value must be owned by p or
    by its ring neighbors p±1 (mod P) — else raises ``ValueError``
    (renumber the mesh first, ``next/mesh_utils.py``). Stored indices are
    rewritten to address ``[lo-halo | owned | hi-halo]`` where the halos
    are the TRAILING ``halo_lo`` rows of the previous shard and the
    LEADING ``halo_hi`` rows of the next (fixed-width slabs, uniform
    across shards — the ppermute exchange shape).
    """
    table = np.asarray(table)
    n_rows, deg = table.shape
    rstarts = ring_partition(n_rows, n_parts)
    vstarts = ring_partition(n_values, n_parts)
    Vw = n_values // n_parts

    valid = np.ones(table.shape, dtype=bool)
    if skip_value is not None:
        valid = table != skip_value
    t = np.clip(table, 0, n_values - 1)

    # Worst-case halo widths over all shards (uniform SPMD shapes).
    halo_lo = 0
    halo_hi = 0
    for p in range(n_parts):
        rows = slice(rstarts[p], rstarts[p + 1])
        tp = t[rows]
        vp = valid[rows]
        lo, hi = vstarts[p], vstarts[p + 1]
        prev_lo = (lo - Vw) % n_values
        next_hi = (hi + Vw - 1) % n_values + 1
        owned = vp & (tp >= lo) & (tp < hi)
        below = vp & ~owned & _in_ring_range(tp, prev_lo, lo, n_values)
        above = vp & ~owned & ~below & _in_ring_range(
            tp, hi % n_values, next_hi, n_values
        )
        foreign = vp & ~owned & ~below & ~above
        if foreign.any():
            r, c = np.nonzero(foreign)
            raise ValueError(
                f"shard {p}: row {rstarts[p] + r[0]} references value "
                f"{int(tp[r[0], c[0]])}, beyond ring neighbors "
                f"[{prev_lo}, {next_hi}) — renumber the mesh "
                f"(next/mesh_utils.py) so ghosts are neighbor-local"
            )
        if below.any():
            # distance back from the owned block start (1 .. Vw)
            d = (lo - tp[below]) % n_values
            halo_lo = max(halo_lo, int(d.max()))
        if above.any():
            d = (tp[above] - hi) % n_values + 1
            halo_hi = max(halo_hi, int(d.max()))

    # Local index rewrite: extended buffer [lo-halo | owned | hi-halo].
    local = np.zeros_like(t, dtype=np.int64)
    for p in range(n_parts):
        rows = slice(rstarts[p], rstarts[p + 1])
        tp = t[rows]
        lo, hi = vstarts[p], vstarts[p + 1]
        owned = (tp >= lo) & (tp < hi)
        below = _in_ring_range(tp, (lo - halo_lo) % n_values, lo, n_values)
        # below: local slot = halo_lo - distance
        dist_back = (lo - tp) % n_values
        loc = np.where(owned, tp - lo + halo_lo, 0)
        loc = np.where(below & ~owned, halo_lo - dist_back, loc)
        above = ~owned & ~below
        dist_fwd = (tp - hi) % n_values
        loc = np.where(above, halo_lo + Vw + dist_fwd, loc)
        local[rows] = loc
    if skip_value is not None:
        local[~valid] = 0  # consumers mask via their own skip handling

    return ShardedGather(
        local.astype(np.int32), halo_lo, halo_hi, Vw, n_parts
    )


def _in_ring_range(x, lo, hi, n):
    """Membership in the cyclic interval [lo, hi) of Z_n."""
    if lo <= hi:
        return (x >= lo) & (x < hi)
    return (x >= lo) | (x < hi)


def halo_gather(values, local_table, plan: ShardedGather, axis_name: str):
    """Inside ``shard_map``: exchange halo slabs with the ring neighbors
    (two ``lax.ppermute``s — ICI collective-permutes) and gather through
    the shard's local table. ``values``: (n_local, ...) owned block;
    ``local_table``: this shard's (rows_local, deg) block of
    ``plan.local_tables``."""
    import jax.numpy as jnp
    from jax import lax

    n = lax.axis_size(axis_name)
    parts = [values]
    if plan.halo_lo:
        send = values[-plan.halo_lo :]
        recv = lax.ppermute(
            send, axis_name, [(i, (i + 1) % n) for i in range(n)]
        )
        parts.insert(0, recv)
    if plan.halo_hi:
        send = values[: plan.halo_hi]
        recv = lax.ppermute(
            send, axis_name, [(i, (i - 1) % n) for i in range(n)]
        )
        parts.append(recv)
    ext = jnp.concatenate(parts, axis=0) if len(parts) > 1 else values
    return jnp.take(ext, local_table, axis=0)
