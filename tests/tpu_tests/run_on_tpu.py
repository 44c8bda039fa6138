"""Hardware validation: Pallas strategies vs the XLA backend on a REAL TPU.

Standalone runner (bypasses the CPU-pinning test conftest):

    python tests/tpu_tests/run_on_tpu.py

Exits 0 printing PASS lines; exits 77 (skip) when no TPU is attached.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def check_hdiff_plane():
    import jax.numpy as jnp

    from gt4py_tpu import storage
    from gt4py_tpu.cartesian import gtscript

    F = gtscript.Field[np.float32]

    def hd(in_f: F, out_f: F, coeff: F):
        with gtscript.computation("PARALLEL"), gtscript.interval(...):
            lap = 4.0 * in_f[0, 0, 0] - (
                in_f[1, 0, 0] + in_f[-1, 0, 0] + in_f[0, 1, 0] + in_f[0, -1, 0]
            )
            flx = lap[1, 0, 0] - lap[0, 0, 0]
            fly = lap[0, 1, 0] - lap[0, 0, 0]
            out_f = in_f[0, 0, 0] - coeff[0, 0, 0] * (
                flx[0, 0, 0] - flx[-1, 0, 0] + fly[0, 0, 0] - fly[0, -1, 0]
            )

    rng = np.random.default_rng(0)
    shape = (132, 132, 16)
    data = rng.random(shape, dtype=np.float32)
    co = rng.random(shape, dtype=np.float32)
    results = {}
    for backend in ("jax", "tpu:pallas"):
        st = gtscript.stencil(
            backend=backend, definition=hd, literal_float_precision=32,
            name=f"hwhd_{backend}",
        )
        a = storage.from_array(data, np.float32, backend=backend)
        c = storage.from_array(co, np.float32, backend=backend)
        o = storage.zeros(shape, np.float32, backend=backend)
        st(a, o, c, origin=(2, 2, 0), domain=(128, 128, 16))
        results[backend] = np.asarray(o)
    np.testing.assert_allclose(results["tpu:pallas"], results["jax"], atol=1e-5)
    print("PASS hdiff plane strategy == XLA backend")


def check_tridiag_staged():
    from gt4py_tpu import storage
    from gt4py_tpu.cartesian import gtscript
    from gt4py_tpu.cartesian.gtscript import BACKWARD, FORWARD, computation, interval

    F = gtscript.Field[np.float32]

    def tri(inf: F, diag: F, sup: F, rhs: F, out: F):
        with computation(FORWARD):
            with interval(0, 1):
                sup = sup / diag
                rhs = rhs / diag
            with interval(1, None):
                sup = sup / (diag - sup[0, 0, -1] * inf)
                rhs = (rhs - inf * rhs[0, 0, -1]) / (diag - sup[0, 0, -1] * inf)
        with computation(BACKWARD):
            with interval(-1, None):
                out = rhs
            with interval(0, -1):
                out = rhs - sup * out[0, 0, 1]

    rng = np.random.default_rng(1)
    shape = (32, 32, 24)
    rhs_np = rng.random(shape, dtype=np.float32)
    results = {}
    for backend in ("jax", "tpu:pallas"):
        st = gtscript.stencil(
            backend=backend, definition=tri, literal_float_precision=32,
            name=f"hwtri_{backend}",
        )
        args = {
            "inf": storage.full(shape, -1.0, np.float32, backend=backend),
            "diag": storage.full(shape, 3.0, np.float32, backend=backend),
            "sup": storage.full(shape, 1.0, np.float32, backend=backend),
            "rhs": storage.from_array(rhs_np, np.float32, backend=backend),
            "out": storage.zeros(shape, np.float32, backend=backend),
        }
        st(**args)
        results[backend] = np.asarray(args["out"])
    np.testing.assert_allclose(results["tpu:pallas"], results["jax"], atol=1e-6)
    print("PASS tridiagonal staged strategy == XLA backend")


def main() -> int:
    import jax

    if jax.default_backend() != "tpu":
        print("SKIP: no TPU attached")
        return 77
    check_hdiff_plane()
    check_tridiag_staged()
    print("ALL HARDWARE CHECKS PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
