"""Laplacian: cartesian GTScript vs field-view DSL (48³ domain).

Counterpart of the reference's ``examples/lap_cartesian_vs_next.ipynb``:
the same Laplacian written in both DSLs, validated against NumPy.

Run: python examples/lap_cartesian_vs_next.py
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

import gt4py_tpu.next as gtx
from gt4py_tpu import storage
from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.cartesian.gtscript import PARALLEL, computation, interval
from gt4py_tpu.next import Dimension, DimensionKind, FieldOffset

N = 48
Field3D = gtscript.Field[np.float64]


# --- cartesian --------------------------------------------------------------


@gtscript.stencil(backend="jax")
def lap_cartesian(inp: Field3D, out: Field3D):
    with computation(PARALLEL), interval(...):
        out = -4.0 * inp + inp[1, 0, 0] + inp[-1, 0, 0] + inp[0, 1, 0] + inp[0, -1, 0]


# --- field view -------------------------------------------------------------

IDim = Dimension("IDim")
JDim = Dimension("JDim")
KDim = Dimension("KDim", kind=DimensionKind.VERTICAL)
Ioff = FieldOffset("Ioff", source=IDim, target=(IDim,))
Joff = FieldOffset("Joff", source=JDim, target=(JDim,))


@gtx.field_operator
def lap_next(inp):
    return -4.0 * inp + inp(Ioff[1]) + inp(Ioff[-1]) + inp(Joff[1]) + inp(Joff[-1])


def main() -> None:
    rng = np.random.default_rng(0)
    data = rng.random((N, N, N))

    def lap_numpy(a):
        return (
            -4.0 * a[1:-1, 1:-1] + a[2:, 1:-1] + a[:-2, 1:-1] + a[1:-1, 2:] + a[1:-1, :-2]
        )

    expected = lap_numpy(data)

    # Cartesian
    inp = storage.from_array(data, backend="jax", aligned_index=(1, 1, 0))
    out = storage.zeros((N, N, N), backend="jax", aligned_index=(1, 1, 0))
    lap_cartesian(inp, out, origin=(1, 1, 0), domain=(N - 2, N - 2, N))
    np.testing.assert_allclose(out.asnumpy()[1:-1, 1:-1], expected)
    print(f"cartesian lap OK on {N}^3")

    # Field view
    finp = gtx.as_field([IDim, JDim, KDim], data)
    fout = gtx.zeros({IDim: (1, N - 1), JDim: (1, N - 1), KDim: N})
    lap_next(finp, out=fout, offset_provider={"Ioff": IDim, "Joff": JDim})
    np.testing.assert_allclose(fout.asnumpy(), expected)
    print(f"field-view lap OK on {N}^3")


if __name__ == "__main__":
    main()
