"""ICI halo exchange for IJ-decomposed fields.

Runs *inside* a ``shard_map`` region: each shard sends its edge slabs to the
four mesh neighbors with ``lax.ppermute`` (point-to-point collective-permute
over the ICI links) and concatenates the received slabs as halos. Boundary
handling is periodic (torus) — matching the wrap-around of the TPU ICI
topology; non-periodic global boundaries are realized by keeping a global
halo in the field allocation (origin/boundary machinery, as in single-chip
gt4py) so the wrapped values are never read.

Corner values are produced by doing the J exchange *after* the I exchange on
the already-I-extended slab (two-step diagonal propagation), so 8-neighbor
stencils (e.g. horizontal diffusion's corner-free pattern as well as true
corner reads) are covered.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _ppermute_shift(x, axis_name: str, shift: int):
    """Send ``x`` to the neighbor ``shift`` steps up the mesh axis
    (periodic)."""
    n = lax.axis_size(axis_name)
    if n == 1:
        return x
    perm = [(i, (i + shift) % n) for i in range(n)]
    return lax.ppermute(x, axis_name, perm)


def exchange_halos_2d(
    local: jax.Array,
    halo: tuple[int, int, int, int],
    *,
    axis_i: str = "x",
    axis_j: str = "y",
) -> jax.Array:
    """Extend a local (i, j, ...) block with halos from mesh neighbors.

    ``halo`` = (i_lo, i_hi, j_lo, j_hi) halo widths. Returns an array of
    shape (ni + i_lo + i_hi, nj + j_lo + j_hi, ...).
    """
    i_lo, i_hi, j_lo, j_hi = halo
    parts = [local]
    if i_lo:
        # Our left halo is the right edge of the left (-1) neighbor: every
        # shard sends its right edge one step "up" the axis.
        recv = _ppermute_shift(local[-i_lo:], axis_i, +1)
        parts.insert(0, recv)
    if i_hi:
        recv = _ppermute_shift(local[:i_hi], axis_i, -1)
        parts.append(recv)
    ext = jnp.concatenate(parts, axis=0) if len(parts) > 1 else local

    parts = [ext]
    if j_lo:
        recv = _ppermute_shift(ext[:, -j_lo:], axis_j, +1)
        parts.insert(0, recv)
    if j_hi:
        recv = _ppermute_shift(ext[:, :j_hi], axis_j, -1)
        parts.append(recv)
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else ext
