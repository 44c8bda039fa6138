"""Field/connectivity constructors (reference: gt4py.next.constructors,
/root/reference/src/gt4py/next/constructors.py:394-611)."""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import numpy as np

from gt4py_tpu.next.common import (
    Connectivity,
    Dimension,
    Domain,
    NamedRange,
    UnitRange,
    domain as make_domain,
)
from gt4py_tpu.next.embedded import Field


def _norm_dtype(dtype: Any) -> np.dtype:
    # Identity checks: ``np.dtype('float64') == float`` is True in numpy,
    # so a membership test would send dtype OBJECTS into the builtin map.
    if dtype is int or dtype is float or dtype is bool:
        return np.dtype({int: np.int64, float: np.float64, bool: np.bool_}[dtype])
    return np.dtype(dtype if dtype is not None else np.float64)


def _resolve_allocator(allocator, device):
    """Allocator precedence: explicit allocator > device spec > default
    (reference allocator protocol, constructors.py:394 +
    custom_layout_allocators.py:35)."""
    from gt4py_tpu.next import allocators as _alloc

    if allocator is not None:
        return allocator
    if device is not None:
        return _alloc.device_allocator(device)
    return None


def empty(domain_spec, dtype: Any = np.float64, *, allocator=None, device=None) -> Field:
    return zeros(domain_spec, dtype, allocator=allocator, device=device)


def zeros(domain_spec, dtype: Any = np.float64, *, allocator=None, device=None) -> Field:
    import jax.numpy as jnp

    dom = make_domain(domain_spec)
    alloc = _resolve_allocator(allocator, device)
    if alloc is not None:
        return Field(dom, alloc.allocate(dom.shape, _norm_dtype(dtype)))
    return Field(dom, jnp.zeros(dom.shape, dtype=_norm_dtype(dtype)))


def ones(domain_spec, dtype: Any = np.float64, *, allocator=None, device=None) -> Field:
    import jax.numpy as jnp

    dom = make_domain(domain_spec)
    return Field(dom, jnp.ones(dom.shape, dtype=_norm_dtype(dtype)))


def full(
    domain_spec, fill_value: Any, dtype: Any = None, *, allocator=None, device=None
) -> Field:
    import jax.numpy as jnp

    dom = make_domain(domain_spec)
    dt = _norm_dtype(dtype) if dtype is not None else None
    return Field(dom, jnp.full(dom.shape, fill_value, dtype=dt))


def as_field(
    domain_spec: Union[Domain, Sequence[Dimension], dict],
    data: Any,
    dtype: Any = None,
    *,
    origin: Optional[dict] = None,
    allocator=None,
    device=None,
) -> Field:
    """Wrap an array as a Field (reference constructors.py:394). When
    ``domain_spec`` is a sequence of Dimensions the ranges come from the
    array shape (optionally offset by ``origin``)."""
    import jax
    import jax.numpy as jnp

    # Traced arrays (inside jit) wrap directly; host data goes through
    # NumPy first so lists/array-likes normalize.
    array = data if isinstance(data, jax.core.Tracer) else jnp.asarray(np.asarray(data))
    if dtype is not None:
        array = array.astype(_norm_dtype(dtype))
    if isinstance(domain_spec, (Domain, dict)):
        dom = make_domain(domain_spec)
    else:
        dims = tuple(domain_spec)
        from gt4py_tpu.next.common import check_dims

        check_dims(dims)
        origin = origin or {}
        ranges = []
        for d, size in zip(dims, array.shape):
            start = -origin.get(d, 0)
            ranges.append(NamedRange(d, UnitRange(start, start + size)))
        dom = Domain(tuple(ranges))
    return Field(dom, array)


def as_connectivity(
    domain_dims: Sequence[Dimension],
    codomain: Dimension,
    data: Any,
    *,
    skip_value: Optional[int] = None,
    allocator=None,
    device=None,
) -> Connectivity:
    """Build a neighbor table (reference constructors.py:529)."""
    dims = tuple(domain_dims)
    if len(dims) != 2:
        raise ValueError("Connectivity requires (source_dim, neighbor_dim)")
    return Connectivity(
        np.asarray(data), domain_dims=dims, codomain=codomain, skip_value=skip_value
    )
