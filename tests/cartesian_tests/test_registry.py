"""Canonical stencil registry x backend matrix.

Reference pattern: every stencil in
tests/cartesian_tests/integration_tests/multi_feature_tests/
stencil_definitions.py is compiled and executed on every registered
backend (test_code_generation.py). Here each registry entry runs on all
backends and results are compared against the `numpy` backend (the
oracle tier — itself validated against hand-written references in
test_stencils.py/test_features.py)."""

import warnings

import numpy as np
import pytest

from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.cartesian.definitions import AccessKind

from . import stencil_defs as defs
from .definitions import ALL_BACKENDS

FAST_BACKENDS = [b for b in ALL_BACKENDS if b != "debug"]


def _alloc_inputs(st, rng, domain):
    """Allocate arrays from the stencil's own field_info metadata (dtype,
    boundary, data dims, axes)."""
    arrays = {}
    for name, fi in st.field_info.items():
        if fi.access == AccessKind.NONE:
            continue
        if not fi.axes:  # GlobalTable
            shape = tuple(fi.data_dims)
            if np.issubdtype(fi.dtype, np.integer):
                arrays[name] = rng.integers(0, 7, shape).astype(fi.dtype)
            else:
                arrays[name] = rng.random(shape).astype(fi.dtype)
            continue
        mask = fi.domain_mask
        spatial = [
            lo + d + hi
            for lo, d, hi, m in zip(
                fi.boundary.lower, domain, fi.boundary.upper, mask
            )
            if m
        ]
        shape = tuple(spatial) + tuple(fi.data_dims)
        if np.issubdtype(fi.dtype, np.integer):
            # integer fields are index-like: keep them in a safe range
            arrays[name] = rng.integers(0, 2, shape).astype(fi.dtype)
        else:
            arrays[name] = (rng.random(shape) + 0.25).astype(fi.dtype)
    return arrays


def _origin(st):
    return {
        name: tuple(b for b, m in zip(fi.boundary.lower, fi.domain_mask) if m)
        + (0,) * len(fi.data_dims)
        for name, fi in st.field_info.items()
        if fi.access != AccessKind.NONE and fi.axes
    }


@pytest.mark.parametrize("name", sorted(defs.REGISTRY))
@pytest.mark.parametrize("backend", FAST_BACKENDS)
def test_registry_stencil(name, backend):
    entry = defs.REGISTRY[name]
    domain = (5, 6, max(7, entry["min_k"]))
    results = {}
    for be in {backend, "numpy"}:
        st = gtscript.stencil(
            backend=be,
            definition=entry["definition"],
            externals=entry["externals"],
            dtypes=entry["dtypes"],
            name=f"{name}_{be.replace(':', '_')}",
        )
        rng = np.random.default_rng(hash(name) % 2**31)
        arrays = _alloc_inputs(st, rng, domain)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # fallback warnings are fine here
            st(**arrays, **entry["scalars"], origin=_origin(st), domain=domain)
        results[be] = arrays
    if backend == "numpy":
        return
    for fname in results[backend]:
        np.testing.assert_allclose(
            results[backend][fname],
            results["numpy"][fname],
            rtol=1e-10,
            atol=1e-12,
            err_msg=f"{name}: field {fname} differs between {backend} and numpy",
        )


@pytest.mark.parametrize("name", sorted(defs.REGISTRY))
def test_registry_stencil_debug_backend(name):
    """The per-point debug interpreter is the independent oracle; run it on
    a tiny domain against numpy."""
    entry = defs.REGISTRY[name]
    domain = (3, 3, max(3, entry["min_k"]))
    results = {}
    for be in ("debug", "numpy"):
        st = gtscript.stencil(
            backend=be,
            definition=entry["definition"],
            externals=entry["externals"],
            dtypes=entry["dtypes"],
            name=f"{name}_dbg_{be}",
        )
        rng = np.random.default_rng(hash(name) % 2**31)
        arrays = _alloc_inputs(st, rng, domain)
        st(**arrays, **entry["scalars"], origin=_origin(st), domain=domain)
        results[be] = arrays
    for fname in results["debug"]:
        np.testing.assert_allclose(
            results["debug"][fname], results["numpy"][fname], rtol=1e-10,
            err_msg=f"{name}: field {fname} differs between debug and numpy",
        )
