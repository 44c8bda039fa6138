"""`broadcast` builtin + zero-dimensional fields (ported behaviors from
/root/reference/tests/next_tests/integration_tests/feature_tests/
ffront_tests/test_broadcast.py: explicit field/scalar broadcast,
post-broadcast shifts, zero-dim fields and implicit mixed-dim
broadcasting through nested operator calls)."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import broadcast

from . import cases
from .cases import (
    IDim,
    IField,
    IJField,
    JDim,
    cartesian_case,  # noqa: F401 (fixture)
)

EmptyField = gtx.Field[(), np.float64]


def test_broadcast_simple(cartesian_case):
    @gtx.field_operator
    def simple_broadcast(inp: IField) -> IJField:
        return broadcast(inp, (IDim, JDim))

    cases.verify_with_default_data(
        cartesian_case, simple_broadcast, ref=lambda inp: np.broadcast_to(
            inp[:, np.newaxis],
            (inp.shape[0], cases.simple_cartesian_case(None).default_sizes[JDim]),
        )
    )


def test_broadcast_scalar(cartesian_case):
    size = cartesian_case.default_sizes[IDim]

    @gtx.field_operator
    def scalar_broadcast():
        return broadcast(1.0, (IDim,))

    out = gtx.zeros({IDim: size})
    cases.verify(cartesian_case, scalar_broadcast, out=out, ref=np.ones(size))


def test_broadcast_two_fields(cartesian_case):
    @gtx.field_operator
    def broadcast_two_fields(
        inp1: IField, inp2: gtx.Field[gtx.Dims[JDim], np.float64]
    ) -> IJField:
        a = broadcast(inp1, (IDim, JDim))
        b = broadcast(inp2, (IDim, JDim))
        return a + b

    cases.verify_with_default_data(
        cartesian_case,
        broadcast_two_fields,
        ref=lambda a, b: a[:, np.newaxis] + b[np.newaxis, :],
    )


def test_broadcast_shifted(cartesian_case):
    @gtx.field_operator
    def broadcast_shift(inp: IField) -> IJField:
        bcasted = broadcast(inp, (IDim, JDim))
        return bcasted(JDim + 1)

    ni = cartesian_case.default_sizes[IDim]
    nj = cartesian_case.default_sizes[JDim]
    inp = cases.allocate(cartesian_case, broadcast_shift, "inp").unique()()
    out = gtx.zeros({IDim: ni, JDim: nj})
    # broadcast values are J-constant, so a J shift is a no-op on values
    cases.verify(
        cartesian_case, broadcast_shift, inp, out=out,
        ref=np.broadcast_to(inp.asnumpy()[:, np.newaxis], (ni, nj)),
    )


def test_zero_dims_fields(cartesian_case):
    @gtx.field_operator
    def implicit_broadcast_scalar(inp: EmptyField) -> EmptyField:
        return inp

    inp = gtx.as_field(gtx.domain({}), np.asarray(1.0))
    out = gtx.as_field(gtx.domain({}), np.asarray(0.0))
    cases.verify(
        cartesian_case, implicit_broadcast_scalar, inp, out=out, ref=np.asarray(1.0)
    )


def test_implicit_broadcast_mixed_dim(cartesian_case):
    @gtx.field_operator
    def fieldop_implicit_broadcast(
        zero_dim_inp: EmptyField, inp: IField, scalar: np.float64
    ) -> IField:
        return inp + zero_dim_inp * scalar

    zero_dim = gtx.as_field(gtx.domain({}), np.asarray(1.0))
    inp = cases.allocate(cartesian_case, fieldop_implicit_broadcast, "inp").unique()()
    out = cases.allocate(cartesian_case, fieldop_implicit_broadcast, cases.RETURN)()
    cases.verify(
        cartesian_case,
        fieldop_implicit_broadcast,
        zero_dim,
        inp,
        np.float64(2.0),
        out=out,
        ref=inp.asnumpy() + 2.0,
    )
