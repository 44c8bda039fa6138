"""Bounded hardware probe: region-masked Pallas kernels on the live Mosaic.

Round-3 observations: region kernels WEDGE the chip (on-device infinite
execution) at (8,9,8) and (24,24,8).  This probe tests LARGER shapes to
find whether the hazard is shape-bound — run it ONLY under a hard
``timeout`` (the caller kills the client process on hang; the tunnel
recovers in ~1-2 min):

    GT4PY_PALLAS_REGIONS_ON_HW=1 timeout 240 python tests/tpu_tests/probe_regions.py 64 64 8

Prints one line per stencil: ``PROBE <name> <strategy> OK|MISMATCH`` and a
final ``PROBE-ALL-DONE``; absence of that line after timeout == wedge at
the shape under test.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("GT4PY_PALLAS_REGIONS_ON_HW", "1")

import numpy as np


def main() -> None:
    cpu_smoke = "--cpu" in sys.argv
    if cpu_smoke:
        sys.argv.remove("--cpu")
    ni, nj, nk = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (64, 64, 8)

    import jax

    if cpu_smoke:
        jax.config.update("jax_platforms", "cpu")
    else:
        assert jax.default_backend() == "tpu", "probe requires the real TPU"

    from gt4py_tpu import storage
    from gt4py_tpu.cartesian import gtscript
    from gt4py_tpu.cartesian.gtscript import (
        FORWARD,
        I,
        J,
        PARALLEL,
        computation,
        horizontal,
        interval,
        region,
    )

    F = gtscript.Field[np.float32]

    def region_parallel(inp: F, out: F):
        with computation(PARALLEL), interval(...):
            out = inp
            with horizontal(region[I[0] : I[2], :]):
                out = inp * 10.0
            with horizontal(region[:, J[-1]]):
                out = 0.0

    def region_conditional(src: F, dst: F):
        with computation(PARALLEL), interval(...):
            dst = src
            with horizontal(region[I[0] : I[2], :]):
                if src > 0.4:
                    dst = src + 1.0
                else:
                    dst = 0.0

    def region_sequential(inp: F, out: F):
        with computation(FORWARD):
            with interval(0, 1):
                out = inp
            with interval(1, None):
                out = out[0, 0, -1] + inp
                with horizontal(region[I[0], :]):
                    out = inp

    rng = np.random.default_rng(7)
    shape = (ni, nj, nk)
    for defn in (region_parallel, region_conditional, region_sequential):
        st = gtscript.stencil(
            backend="tpu:pallas", definition=defn, literal_float_precision=32
        )
        oracle = gtscript.stencil(
            backend="numpy", definition=defn, literal_float_precision=32
        )
        a_h = rng.random(shape, dtype=np.float32)
        a = storage.from_array(a_h, backend="tpu:pallas")
        b = storage.zeros(shape, dtype=np.float32, backend="tpu:pallas")
        exec_info: dict = {}
        st(a, b, exec_info=exec_info)
        got = np.asarray(b)  # blocks; a hang here == wedge
        a_ref = np.array(a_h)
        b_ref = np.zeros(shape, dtype=np.float32)
        oracle(a_ref, b_ref)
        strategy = exec_info.get("pallas_strategy")
        ok = np.allclose(got, b_ref, rtol=2e-5, atol=1e-6)
        print(f"PROBE {defn.__name__} {strategy} {'OK' if ok else 'MISMATCH'}", flush=True)
        if strategy == "xla":
            print(f"PROBE-NOTE {defn.__name__} served by XLA fallback", flush=True)
    print("PROBE-ALL-DONE", flush=True)


if __name__ == "__main__":
    main()
