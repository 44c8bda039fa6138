"""StencilBuilder orchestration tests (reference
tests/cartesian_tests/unit_tests/test_stencil_builder.py: chainable
configuration, cached pipeline stages, build-data record)."""

import numpy as np

from gt4py_tpu import storage
from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.cartesian.gtscript import PARALLEL, computation, interval
from gt4py_tpu.cartesian.stencil_builder import StencilBuilder

Field3D = gtscript.Field[np.float64]


def copy_defn(a: Field3D, b: Field3D):
    with computation(PARALLEL), interval(...):
        b = a[0, 0, 0]


def test_chainable_build_and_call():
    obj = StencilBuilder(copy_defn).with_backend("numpy").build()
    a = storage.ones((4, 4, 3), backend="numpy")
    b = storage.zeros((4, 4, 3), backend="numpy")
    obj(a, b)
    np.testing.assert_allclose(np.asarray(b), 1.0)


def test_gtir_cached_per_configuration():
    builder = StencilBuilder(copy_defn, backend="numpy")
    first = builder.gtir
    assert builder.gtir is first
    builder.with_backend("debug")
    assert builder.gtir is not first  # dirty -> re-analyzed


def test_fingerprint_changes_with_backend():
    b1 = StencilBuilder(copy_defn, backend="numpy")
    b2 = StencilBuilder(copy_defn, backend="debug")
    assert b1.stencil_id != b2.stencil_id


def test_memoized_across_builders():
    o1 = StencilBuilder(copy_defn, backend="numpy").build()
    o2 = StencilBuilder(copy_defn, backend="numpy").build()
    assert o1 is o2


def test_build_data_record_persisted():
    builder = StencilBuilder(copy_defn, backend="numpy")
    builder.build()
    record = builder.build_data()
    assert record.get("status") == "done"
    assert record.get("backend") == "numpy"
    assert record.get("fingerprint") == builder.stencil_id
    assert record.get("parse_time", -1) >= 0


def test_with_backend_data_merges():
    builder = StencilBuilder(copy_defn, backend="numpy")
    builder.with_backend_data(foo=1).with_backend_data(bar="x")
    assert builder.backend_data == {"foo": 1, "bar": "x"}


def test_externals_affect_fingerprint():
    b1 = StencilBuilder(copy_defn, backend="numpy")
    fp1 = b1.stencil_id
    b1.with_externals({"N": 3})
    assert b1.stencil_id != fp1


def test_lazy_stencil_exposes_builder():
    from gt4py_tpu.cartesian.lazy_stencil import LazyStencil

    lazy = LazyStencil(copy_defn, "numpy", {})
    assert isinstance(lazy.builder, StencilBuilder)
    lazy.check_syntax()  # frontend+analysis only, no backend build
    a = storage.ones((4, 4, 3), backend="numpy")
    b = storage.zeros((4, 4, 3), backend="numpy")
    lazy(a, b)
    np.testing.assert_allclose(np.asarray(b), 1.0)


def test_jax_backend_specialization_cache():
    """The jax backend compiles once per (domain, origin, shape) variant
    and reuses the specialized executable across calls (reference
    CompiledProgramsPool role, otf/compiled_program.py:333)."""
    obj = StencilBuilder(copy_defn).with_backend("jax").with_options(
        rebuild=True, name="spec_cache_probe"
    ).build()
    be = obj._backend
    a = storage.ones((6, 6, 3), backend="jax")
    b = storage.zeros((6, 6, 3), backend="jax")
    obj(a, b, domain=(6, 6, 3))
    n1 = len(be._cache)
    obj(a, b, domain=(6, 6, 3))
    assert len(be._cache) == n1  # same variant reused
    obj(a, b, domain=(4, 4, 3))  # new domain -> new specialization
    assert len(be._cache) == n1 + 1
    obj(a, b, origin={"a": (1, 1, 0), "b": (1, 1, 0)}, domain=(4, 4, 3))
    assert len(be._cache) == n1 + 2  # new origins -> new specialization


def test_concurrent_stencil_calls_thread_safe():
    """Concurrent first-calls race the jax-backend specialization cache;
    each thread's own storages must hold correct results."""
    import threading

    obj = StencilBuilder(copy_defn).with_backend("jax").with_options(
        rebuild=True, name="thread_probe"
    ).build()
    errors = []
    barrier = threading.Barrier(6)

    def run(i):
        try:
            barrier.wait(timeout=30)
            a = storage.from_array(np.full((5, 5, 2), float(i)), backend="jax")
            b = storage.zeros((5, 5, 2), backend="jax")
            obj(a, b)
            np.testing.assert_allclose(np.asarray(b), float(i))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors, errors
