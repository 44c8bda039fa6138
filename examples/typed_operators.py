"""Typed field operators: definition-time type deduction.

Annotating parameters with ``Field[Dims[...], dtype]`` opts a field
operator into AST-level type checking (the reference's FOAST type
deduction): dimension/dtype mistakes surface at decoration time with
source locations, and calls are validated against the deduced signature
before any trace.

Run: python examples/typed_operators.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import gt4py_tpu.next as gtx
from gt4py_tpu.next import Dimension, Dims, Field, FieldOffset
from gt4py_tpu.next.errors import DSLTypeError

I = Dimension("I")
J = Dimension("J")
Ioff = FieldOffset("Ioff", source=I, target=(I,))
Joff = FieldOffset("Joff", source=J, target=(J,))

F64 = Field[Dims[I, J], np.float64]


@gtx.field_operator
def laplacian(phi: F64) -> F64:
    return -4.0 * phi + phi(Ioff[1]) + phi(Ioff[-1]) + phi(Joff[1]) + phi(Joff[-1])


def main() -> None:
    print("deduced signature:", laplacian.type_info)

    n = 16
    phi = gtx.as_field([I, J], np.random.default_rng(0).random((n, n)))
    out = gtx.zeros({I: (1, n - 1), J: (1, n - 1)})
    laplacian(phi, out=out, offset_provider={"Ioff": I, "Joff": J})
    print("laplacian out[0,:3] =", out.asnumpy()[0, :3])

    # A wrongly-dimensioned argument is rejected BEFORE tracing:
    bad = gtx.as_field([I], np.zeros(n))
    try:
        laplacian(bad, out=out, offset_provider={"Ioff": I, "Joff": J})
    except DSLTypeError as e:
        print("rejected:", str(e).splitlines()[0])

    # Definition mistakes error at decoration time, with a location:
    try:

        @gtx.field_operator
        def broken(a: Field[Dims[J], np.float64]):
            return a(Ioff[1])  # no I dimension to shift along

    except DSLTypeError as e:
        print("decoration-time error:", str(e).splitlines()[0])


if __name__ == "__main__":
    main()
