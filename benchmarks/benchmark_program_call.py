"""Program call-overhead benchmarks.

Counterpart of the reference's pytest-benchmark harness
(reference tests/next_tests/benchmarks/benchmark_program_call.py:49-135):
measures the per-call overhead of the stencil/operator dispatch machinery
(argument binding, validation, origin/domain cache, pool lookup) with the
device work subtracted — the "call overhead" that `freeze()` and the
compiled-programs pool exist to minimize.

Run: python benchmarks/benchmark_program_call.py
Prints one JSON line per benchmark.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, n=200, warmup=20):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def bench_cartesian():
    from gt4py_tpu import storage
    from gt4py_tpu.cartesian import gtscript

    Field3D = gtscript.Field[np.float32]

    def copy_def(a: Field3D, b: Field3D):
        with gtscript.computation("PARALLEL"), gtscript.interval(...):
            b = a[0, 0, 0]

    st = gtscript.stencil(backend="jax", definition=copy_def, literal_float_precision=32)
    a = storage.ones((16, 16, 4), np.float32, backend="jax")
    b = storage.zeros((16, 16, 4), np.float32, backend="jax")

    t_call = timeit(lambda: st(a, b))
    frozen = st.freeze(origin={"a": (0, 0, 0), "b": (0, 0, 0)}, domain=(16, 16, 4))
    t_frozen = timeit(lambda: frozen(a=a, b=b))
    t_novalidate = timeit(lambda: st(a, b, validate_args=False))

    # Chained per-step overhead: one chain dispatch amortized over its
    # steps. The whole loop is one on-device executable, so the PER-STEP
    # dispatch overhead is (t_chain(N) - t_chain(M)) / (N - M) minus the
    # device work — on this trivial copy stencil the difference IS the
    # overhead bound.
    swap = {"a": "b", "b": "a"}
    st.chain(2, a, b, swap=swap)  # compile
    n_lo, n_hi = 64, 1088
    t_lo = timeit(lambda: st.chain(n_lo, a, b, swap=swap), n=20, warmup=3)
    t_hi = timeit(lambda: st.chain(n_hi, a, b, swap=swap), n=20, warmup=3)
    t_chain_step = (t_hi - t_lo) / (n_hi - n_lo)
    return {
        "stencil_call_us": round(t_call * 1e6, 1),
        "stencil_call_novalidate_us": round(t_novalidate * 1e6, 1),
        "frozen_call_us": round(t_frozen * 1e6, 1),
        "chained_per_step_us": round(max(t_chain_step, 0.0) * 1e6, 2),
        "chain_dispatch_us": round(t_lo / 1 * 1e6, 1),
    }


def bench_field_operator():
    import gt4py_tpu.next as gtx
    from gt4py_tpu.next.common import Dimension

    I = Dimension("I")

    @gtx.field_operator
    def copy(a):
        return a

    a = gtx.as_field({I: 64}, np.zeros(64))
    out = gtx.zeros({I: 64})
    t_call = timeit(lambda: copy(a, out=out))
    return {"field_operator_call_us": round(t_call * 1e6, 1)}


def bench_scan_and_program():
    import numpy as np

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import Dimension, DimensionKind

    I = Dimension("Ib")
    K = Dimension("Kb", kind=DimensionKind.VERTICAL)

    @gtx.scan_operator(axis=K, forward=True, init=0.0)
    def cumsum(c, x):
        return c + x

    f2 = gtx.as_field([I, K], np.random.default_rng(0).random((16, 8)))
    sout = gtx.zeros({I: 16, K: 8})
    cumsum(f2, out=sout)
    t_scan = timeit(lambda: cumsum(f2, out=sout))

    @gtx.field_operator
    def dbl(a):
        return a * 2.0

    @gtx.field_operator
    def inc(a):
        return a + 1.0

    @gtx.program
    def pipeline(a, tmp, out):
        dbl(a, out=tmp)
        inc(tmp, out=out)

    a = gtx.as_field([I], np.arange(64.0))
    tmp = gtx.zeros({I: 64})
    out = gtx.zeros({I: 64})
    pipeline(a, tmp, out)
    t_prog = timeit(lambda: pipeline(a, tmp, out))
    return {
        "scan_call_us": round(t_scan * 1e6, 1),
        "program_call_2ops_us": round(t_prog * 1e6, 1),
    }


def main():
    results = {}
    results.update(bench_cartesian())
    results.update(bench_field_operator())
    results.update(bench_scan_and_program())
    print(json.dumps({"benchmark": "program_call_overhead", **results}))


if __name__ == "__main__":
    main()
