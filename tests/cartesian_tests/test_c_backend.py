"""Native compiled-C backend (``cpu:c``) specifics.

The cross-backend correctness of ``cpu:c`` is covered by the registry
matrix (test_registry.py), the hypothesis suites (test_suites*.py) and
the feature tests — everything there runs on every registered backend.
This file covers what is unique to the C path: that supported stencils
are genuinely SERVED by compiled C (no silent fallback), that the
fallback is honest and recorded, that the generated source has the
structure the docs promise, and that the on-disk object cache is reused.

Reference pattern: the gtcpp backend's own tests assert generated-code
properties and build caching (/root/reference/tests/cartesian_tests/
unit_tests/test_gtc/test_gtcpp_codegen.py).
"""

import warnings

import numpy as np
import pytest

from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.cartesian.gtscript import (
    BACKWARD,
    FORWARD,
    PARALLEL,
    Field,
    computation,
    interval,
)


def _run_pair(definition, domain=(6, 7, 8), halo=1, dtype=np.float64, **kwargs):
    """Run on cpu:c and numpy; return (c_outputs, numpy_outputs, c_backend)."""
    results = {}
    backend_obj = None
    for be in ("cpu:c", "numpy"):
        st = gtscript.stencil(
            backend=be,
            definition=definition,
            name=f"{definition.__name__}_{be.replace(':', '_')}",
        )
        rng = np.random.default_rng(7)
        arrays = {}
        for name, fi in st.field_info.items():
            lo, up = fi.boundary.lower, fi.boundary.upper
            shape = tuple(
                l + d + u
                for l, d, u, m in zip(lo, domain, up, fi.domain_mask)
                if m
            ) + tuple(fi.data_dims)
            arrays[name] = rng.random(shape).astype(fi.dtype)
        origin = {
            name: tuple(b for b, m in zip(fi.boundary.lower, fi.domain_mask) if m)
            + (0,) * len(fi.data_dims)
            for name, fi in st.field_info.items()
        }
        st(**arrays, **kwargs, origin=origin, domain=domain)
        results[be] = arrays
        if be == "cpu:c":
            backend_obj = st._backend
    return results["cpu:c"], results["numpy"], backend_obj


def test_supported_stencil_serves_from_c():
    def diffuse(inp: Field[np.float64], out: Field[np.float64], alpha: np.float64):
        with computation(PARALLEL), interval(...):
            out = inp + alpha * (
                inp[1, 0, 0] + inp[-1, 0, 0] + inp[0, 1, 0] + inp[0, -1, 0] - 4.0 * inp
            )

    got, want, backend = _run_pair(diffuse, alpha=0.3)
    assert backend.last_path == "c"
    np.testing.assert_array_equal(got["out"], want["out"])


def test_sequential_scan_serves_from_c():
    def cumsum(inp: Field[np.float64], out: Field[np.float64]):
        with computation(FORWARD):
            with interval(0, 1):
                out = inp
            with interval(1, None):
                out = out[0, 0, -1] + inp
        with computation(BACKWARD), interval(...):
            out = out + 0.0

    got, want, backend = _run_pair(cumsum)
    assert backend.last_path == "c"
    np.testing.assert_array_equal(got["out"], want["out"])


def test_half_float_falls_back_to_numpy_with_warning():
    import jax.numpy as jnp  # bfloat16 dtype object

    bf16 = np.dtype(jnp.bfloat16)

    def scale(inp: Field[bf16], out: Field[bf16]):  # type: ignore[valid-type]
        with computation(PARALLEL), interval(...):
            out = inp + inp

    st = gtscript.stencil(backend="cpu:c", definition=scale, name="scale_bf16_c")
    a = np.ones((4, 4, 4), dtype=bf16)
    b = np.zeros((4, 4, 4), dtype=bf16)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        st(inp=a, out=b, domain=(4, 4, 4))
    assert st._backend.last_path == "numpy_fallback"
    assert any("falling back" in str(w.message) for w in caught)
    np.testing.assert_array_equal(np.asarray(b, dtype=np.float32), 2.0)


def test_generated_source_structure():
    from gt4py_tpu.cartesian.backend.c_codegen import generate
    from gt4py_tpu.cartesian.passes.pipeline import analyze

    def vark(inp: Field[np.float64], idx: Field[np.int64], out: Field[np.float64]):
        with computation(PARALLEL), interval(...):
            out = inp[0, 0, idx]

    module = generate(analyze(vark, {"name": "varkc", "backend_opts": {}}))
    src = module.source
    assert "void gt_run(" in src
    assert "#pragma omp parallel for" in src
    # Variable-K reads clamp, like the numpy/debug oracles.
    assert "gt_clampk" in src
    # The fixed ABI exposes strides in bytes — no layout assumptions.
    assert "strides[" in src


def test_object_cache_reused_across_builds():
    from gt4py_tpu.cartesian.backend import c_backend as cb

    def plus1(inp: Field[np.float64], out: Field[np.float64]):
        with computation(PARALLEL), interval(...):
            out = inp + 1.0

    st1 = gtscript.stencil(backend="cpu:c", definition=plus1, name="plus1_a")
    a = np.zeros((3, 3, 3))
    b = np.zeros((3, 3, 3))
    st1(inp=a, out=b, domain=(3, 3, 3))
    n_libs = len(cb._LIB_CACHE)
    # Same definition under a new name: identical source → same lib.
    st2 = gtscript.stencil(backend="cpu:c", definition=plus1, name="plus1_b")
    st2(inp=a, out=b, domain=(3, 3, 3))
    assert len(cb._LIB_CACHE) == n_libs


def test_aliased_in_place_call_matches_numpy():
    """Reading and writing the same array through two parameters must not
    be miscompiled (the generated pointers are deliberately NOT restrict)."""

    def axpy(x: Field[np.float64], y: Field[np.float64]):
        with computation(PARALLEL), interval(...):
            y = 2.0 * x + y

    for be in ("cpu:c", "numpy"):
        st = gtscript.stencil(backend=be, definition=axpy, name=f"axpy_{be[-1]}")
        arr = np.full((4, 4, 4), 3.0)
        st(x=arr, y=arr, domain=(4, 4, 4))
        np.testing.assert_array_equal(arr, 9.0)


def test_parallel_statement_ordering():
    """Within a PARALLEL computation each statement sweeps the whole domain
    before the next starts — a later statement sees the earlier one's
    writes at every K level (GTScript parallel-assignment semantics)."""

    def two_step(inp: Field[np.float64], out: Field[np.float64]):
        with computation(PARALLEL), interval(...):
            tmp = inp * 2.0
            out = tmp[1, 0, 0] + tmp[-1, 0, 0]

    got, want, backend = _run_pair(two_step)
    assert backend.last_path == "c"
    np.testing.assert_array_equal(got["out"], want["out"])


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int32, np.int64])
def test_numpy_semantics_mod_pow_div(dtype):
    """Floor-mod, integer power, and int-division-promotes-to-float follow
    NumPy, not C (% is floor-mod; / on ints is true division)."""
    is_int = np.issubdtype(dtype, np.integer)

    def arith(a: Field[dtype], b: Field[dtype], out: Field[np.float64]):  # type: ignore[valid-type]
        with computation(PARALLEL), interval(...):
            out = (a % b) + a**2 + a / b

    results = {}
    for be in ("cpu:c", "numpy"):
        st = gtscript.stencil(backend=be, definition=arith, name=f"arith_{be[-1]}_{np.dtype(dtype).name}")
        rng = np.random.default_rng(3)
        if is_int:
            a = rng.integers(-9, 9, (4, 4, 4)).astype(dtype)
            b = (rng.integers(1, 5, (4, 4, 4)) * rng.choice([-1, 1], (4, 4, 4))).astype(dtype)
        else:
            a = (rng.random((4, 4, 4)) * 4 - 2).astype(dtype)
            b = ((rng.random((4, 4, 4)) + 0.5) * rng.choice([-1, 1], (4, 4, 4))).astype(dtype)
        out = np.zeros((4, 4, 4))
        st(a=a, b=b, out=out, domain=(4, 4, 4))
        results[be] = out
    np.testing.assert_allclose(results["cpu:c"], results["numpy"], rtol=1e-14)
