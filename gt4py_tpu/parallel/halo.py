"""ICI halo exchange for IJ-decomposed fields.

Runs *inside* a ``shard_map`` region: each shard sends its edge slabs to the
four mesh neighbors with ``lax.ppermute`` (point-to-point collective-permute
over the ICI links) and concatenates the received slabs as halos. The
GLOBAL boundary condition is selectable per axis: ``periodic`` (ICI torus
wrap), ``clamp`` (edge replication — the standard non-periodic dycore
boundary) or ``zero``; non-periodic modes overwrite the wrapped slab on
boundary shards only, so interior exchanges are identical.

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


def _boundary_fill(recv, local_edge, axis_name: str, side: str, mode: str):
    """Replace the wrapped slab on GLOBAL-boundary shards for non-periodic
    modes: 'clamp' replicates the shard's own edge, 'zero' fills zeros."""
    if mode == "periodic":
        return recv
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    at_boundary = idx == 0 if side == "lo" else idx == n - 1
    if mode == "clamp":
        fill = local_edge
    elif mode == "zero":
        fill = jnp.zeros_like(recv)
    else:
        raise ValueError(f"unknown boundary mode '{mode}'")
    return jnp.where(at_boundary, fill, recv)


def _clamp_edge(x, axis: int, side: str, width: int):
    """``width`` copies of the outermost row/column (edge replication)."""
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, 1) if side == "lo" else slice(-1, None)
    edge = x[tuple(sl)]
    reps = [1] * x.ndim
    reps[axis] = width
    return jnp.tile(edge, reps)


def exchange_halos_2d(
    local: jax.Array,
    halo: tuple[int, int, int, int],
    *,
    axis_i: str = "x",
    axis_j: str = "y",
    boundary: str | tuple[str, str] = "periodic",
) -> jax.Array:
    """Extend a local (i, j, ...) block with halos from mesh neighbors.

    ``halo`` = (i_lo, i_hi, j_lo, j_hi) halo widths. Returns an array of
    shape (ni + i_lo + i_hi, nj + j_lo + j_hi, ...).

    ``boundary`` selects the GLOBAL domain boundary condition per axis
    (one value or an (i, j) pair): ``"periodic"`` keeps the ICI torus
    wrap; ``"clamp"`` replicates the global edge into the halo (the usual
    non-periodic dycore boundary, round-1 verdict item 8); ``"zero"``
    fills zeros. Interior shard exchanges are identical in all modes.
    """
    if isinstance(boundary, str):
        b_i = b_j = boundary
    else:
        b_i, b_j = boundary
    i_lo, i_hi, j_lo, j_hi = halo
    parts = [local]
    if i_lo:
        # Our left halo is the right edge of the left (-1) neighbor: every
        # shard sends its right edge one step "up" the axis.
        recv = _ppermute_shift(local[-i_lo:], axis_i, +1)
        recv = _boundary_fill(recv, _clamp_edge(local, 0, "lo", i_lo), axis_i, "lo", b_i)
        parts.insert(0, recv)
    if i_hi:
        recv = _ppermute_shift(local[:i_hi], axis_i, -1)
        recv = _boundary_fill(recv, _clamp_edge(local, 0, "hi", i_hi), axis_i, "hi", b_i)
        parts.append(recv)
    ext = jnp.concatenate(parts, axis=0) if len(parts) > 1 else local

    parts = [ext]
    if j_lo:
        recv = _ppermute_shift(ext[:, -j_lo:], axis_j, +1)
        recv = _boundary_fill(recv, _clamp_edge(ext, 1, "lo", j_lo), axis_j, "lo", b_j)
        parts.insert(0, recv)
    if j_hi:
        recv = _ppermute_shift(ext[:, :j_hi], axis_j, -1)
        recv = _boundary_fill(recv, _clamp_edge(ext, 1, "hi", j_hi), axis_j, "hi", b_j)
        parts.append(recv)
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else ext
