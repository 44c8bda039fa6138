"""Compile runners and variant enumeration for the OTF pool.

Reference parity: worker-process variant compilation
(/root/reference/src/gt4py/next/otf/compilation_tasks.py:136) and
static-descriptor cross products (otf/compiled_program.py). Domains are
always compile-time static under XLA, so the reference's static_domains
knob has no separate surface here (see CompilationOptions docstring).
"""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import Dimension
from gt4py_tpu.next.otf import CompilationOptions

IDim = Dimension("IDim")


# Module-level so the process runner can pickle the operator definition.
@gtx.field_operator
def scaled_sum(a, b, f: float):
    return (a + b) * f


def _fields():
    rng = np.random.default_rng(0)
    a = gtx.as_field([IDim], rng.random(16, dtype=np.float64))
    b = gtx.as_field([IDim], rng.random(16, dtype=np.float64))
    out = gtx.zeros({IDim: 16}, dtype=np.float64)
    return a, b, out


@pytest.mark.parametrize("runner", ["sync", "thread"])
def test_async_runner_correctness(runner, recwarn):
    op = scaled_sum.with_compilation_options(
        options=CompilationOptions(
            static_params=("f",), async_compile=True, runner=runner
        )
    )
    a, b, out = _fields()
    op(a, b, out=out, f=3.0)
    op.wait_for_compilation()
    np.testing.assert_allclose(
        np.asarray(out.ndarray), (np.asarray(a.ndarray) + np.asarray(b.ndarray)) * 3.0
    )
    assert len(op._pool) == 1


def test_compile_variant_cross_product():
    op = scaled_sum.with_compilation_options(
        options=CompilationOptions(static_params=("f",))
    )
    a, b, out = _fields()
    op.compile(a, b, f=[1.0, 2.0, 3.0])
    assert len(op._pool) == 3
    # Calls with precompiled statics hit the pool without growing it.
    op(a, b, out=out, f=2.0)
    assert len(op._pool) == 3
    np.testing.assert_allclose(
        np.asarray(out.ndarray), (np.asarray(a.ndarray) + np.asarray(b.ndarray)) * 2.0
    )


def test_process_runner_ships_or_falls_back(recwarn):
    # The only spawn-based test (a child process re-imports jax, ~40s):
    # keep exactly one to cover the genuine ship-back path.
    """On the CPU test platform the process path must genuinely ship the
    program to a worker — including the FUSED write-back variant (whose
    builder must pickle; a lambda here used to silently demote to a
    thread). Deserialize-side degradation (PJRT per-client quirks) stays
    tolerated; submit-side thread fallback does not."""
    op = scaled_sum.with_compilation_options(
        options=CompilationOptions(
            static_params=("f",), async_compile=True, runner="process",
            compile_workers=1,
        )
    )
    a, b, out = _fields()
    op(a, b, out=out, f=0.5)
    np.testing.assert_allclose(
        np.asarray(out.ndarray), (np.asarray(a.ndarray) + np.asarray(b.ndarray)) * 0.5
    )
    fallbacks = [
        w for w in recwarn.list if "not process-shippable" in str(w.message)
    ]
    assert not fallbacks, "process runner silently degraded to a thread"


def test_field_operator_pickles():
    import pickle

    blob = pickle.dumps(scaled_sum)
    clone = pickle.loads(blob)
    a, b, out = _fields()
    clone(a, b, out=out, f=2.0)
    np.testing.assert_allclose(
        np.asarray(out.ndarray), (np.asarray(a.ndarray) + np.asarray(b.ndarray)) * 2.0
    )


def test_pool_thread_safety():
    """Concurrent first-calls race the pool's compile-on-miss path
    (reference CompiledProgramsPool locks); every thread must see a
    correct result and the pool must not compile-per-thread forever."""
    import threading

    import numpy as np

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import Dimension

    I = Dimension("I")

    @gtx.field_operator
    def triple(a):
        return a * 3.0

    data = np.arange(16.0)
    errors = []
    barrier = threading.Barrier(8)

    def run(i):
        try:
            barrier.wait(timeout=30)
            out = gtx.zeros({I: 16})
            triple(gtx.as_field([I], data + i), out=out)
            np.testing.assert_allclose(out.asnumpy(), (data + i) * 3.0)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors, errors
    # All threads share one signature -> exactly one pool entry.
    assert len(triple._pool) == 1
