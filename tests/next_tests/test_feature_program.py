"""Program-level feature matrix (ported behaviors from
/root/reference/tests/next_tests/integration_tests/feature_tests/
ffront_tests/test_program.py: sliced out-args, double-copy through an
intermediate, operators calling operators inside programs, tuple out
args constructed inside (flat / sliced / nested), wrong-dimension
argument rejection, mismatched domain dims, non-zero domain starts)."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx

from . import cases
from .cases import (
    IDim,
    IField,
    IJField,
    JDim,
    cartesian_case,  # noqa: F401 (fixture)
)


def test_identity_fo_execution(cartesian_case):
    @gtx.field_operator
    def identity(in_field: IField) -> IField:
        return in_field

    size = cartesian_case.default_sizes[IDim]
    in_field = gtx.ones({IDim: size})
    out_field = gtx.zeros({IDim: size})
    cases.verify(
        cartesian_case, identity, in_field, out=out_field, ref=np.ones(size)
    )


def test_shift_by_one_sliced_out_execution(cartesian_case):
    @gtx.field_operator
    def shift_by_one(in_field: IField) -> IField:
        return in_field(IDim + 1)

    @gtx.program
    def shift_by_one_program(in_field, out_field):
        shift_by_one(in_field, out=out_field[:-1])

    size = cartesian_case.default_sizes[IDim]
    in_field = cases.allocate(cartesian_case, shift_by_one, "in_field").extend(
        {IDim: (0, 1)}
    ).unique()()
    out_field = gtx.zeros({IDim: size})
    cases.run(cartesian_case, shift_by_one_program, in_field, out_field)
    np.testing.assert_allclose(
        out_field.asnumpy()[:-1], in_field.asnumpy()[1:-1]
    )
    assert out_field.asnumpy()[-1] == 0.0


def test_double_copy_execution(cartesian_case):
    @gtx.field_operator
    def copy(inp: IField) -> IField:
        return inp

    @gtx.program
    def double_copy_program(in_field, intermediate_field, out):
        copy(in_field, out=intermediate_field)
        copy(intermediate_field, out=out)

    in_field = cases.allocate(cartesian_case, copy, "inp").unique()()
    size = cartesian_case.default_sizes[IDim]
    intermediate = gtx.zeros({IDim: size})
    out = gtx.zeros({IDim: size})
    cases.verify(
        cartesian_case, double_copy_program, in_field, intermediate, out,
        inout=out, ref=in_field.asnumpy(),
    )


def test_calling_fo_from_fo_in_program(cartesian_case):
    @gtx.field_operator
    def pow_two(field: IField) -> IField:
        return field * field

    @gtx.field_operator
    def pow_three(field: IField) -> IField:
        return field * pow_two(field)

    @gtx.program
    def fo_from_fo_program(in_field, out):
        pow_three(in_field, out=out)

    in_field = cases.allocate(cartesian_case, pow_three, "field").unique()()
    out = gtx.zeros({IDim: cartesian_case.default_sizes[IDim]})
    cases.verify(
        cartesian_case, fo_from_fo_program, in_field, out,
        inout=out, ref=in_field.asnumpy() ** 3,
    )


def test_tuple_program_return_constructed_inside(cartesian_case):
    @gtx.field_operator
    def pack_tuple(a: IField, b: IField) -> tuple[IField, IField]:
        return (a, b)

    @gtx.program
    def prog(a, b, out_a, out_b):
        pack_tuple(a, b, out=(out_a, out_b))

    a = cases.allocate(cartesian_case, pack_tuple, "a").unique()()
    b = cases.allocate(cartesian_case, pack_tuple, "b").unique()()
    size = cartesian_case.default_sizes[IDim]
    out_a = gtx.zeros({IDim: size})
    out_b = gtx.zeros({IDim: size})
    cases.verify(
        cartesian_case, prog, a, b, out_a, out_b,
        inout=(out_a, out_b), ref=(a, b),
    )


def test_tuple_program_return_constructed_inside_with_slicing(cartesian_case):
    @gtx.field_operator
    def pack_tuple(a: IField, b: IField) -> tuple[IField, IField]:
        return (a, b)

    @gtx.program
    def prog(a, b, out_a, out_b):
        pack_tuple(a, b, out=(out_a[1:], out_b[1:]))

    size = cartesian_case.default_sizes[IDim]
    a = gtx.ones({IDim: size})
    b = gtx.as_field([IDim], np.full(size, 2.0))
    out_a = gtx.zeros({IDim: size})
    out_b = gtx.zeros({IDim: size})
    cases.run(cartesian_case, prog, a, b, out_a, out_b)
    np.testing.assert_allclose(out_a.asnumpy()[1:], a.asnumpy()[1:])
    np.testing.assert_allclose(out_b.asnumpy()[1:], b.asnumpy()[1:])
    assert out_a.asnumpy()[0] == 0.0 and out_b.asnumpy()[0] == 0.0


def test_tuple_program_return_constructed_inside_nested(cartesian_case):
    @gtx.field_operator
    def pack_tuple(
        a: IField, b: IField, c: IField
    ) -> tuple[tuple[IField, IField], IField]:
        return ((a, b), c)

    @gtx.program
    def prog(a, b, c, out_a, out_b, out_c):
        pack_tuple(a, b, c, out=((out_a, out_b), out_c))

    size = cartesian_case.default_sizes[IDim]
    a = gtx.ones({IDim: size})
    b = gtx.as_field([IDim], np.full(size, 2.0))
    c = gtx.as_field([IDim], np.full(size, 3.0))
    out_a = gtx.zeros({IDim: size})
    out_b = gtx.zeros({IDim: size})
    out_c = gtx.zeros({IDim: size})
    cases.verify(
        cartesian_case, prog, a, b, c, out_a, out_b, out_c,
        inout=((out_a, out_b), out_c), ref=((a, b), c),
    )


def test_wrong_argument_dims_rejected(cartesian_case):
    @gtx.field_operator
    def identity(in_field: IField) -> IField:
        return in_field

    nj = cartesian_case.default_sizes[JDim]
    inp = cartesian_case.as_field([JDim], np.ones(nj))
    out = gtx.zeros({JDim: nj})
    with pytest.raises(Exception, match="(?i)idim|dimension|dims|type"):
        cases.run(cartesian_case, identity, inp, out=out)


def test_mismatched_domain_dims_rejected(cartesian_case):
    @gtx.field_operator
    def fieldop(a: IField) -> IField:
        return a

    a = cases.allocate(cartesian_case, fieldop, "a").unique()()
    out = gtx.zeros({IDim: cartesian_case.default_sizes[IDim]})
    with pytest.raises(Exception, match="(?i)domain|dimension"):
        cases.run(
            cartesian_case, fieldop, a, out=out,
            domain={JDim: (0, 1)},
        )


def test_out_field_with_non_zero_domain_start(cartesian_case):
    @gtx.field_operator
    def copy(in_field: IField) -> IField:
        return in_field

    size = cartesian_case.default_sizes[IDim]
    inp = cases.allocate(cartesian_case, copy, "in_field").unique()()
    out = gtx.zeros({IDim: (1, size - 2)})
    cases.verify(
        cartesian_case, copy, inp, out=out, ref=inp.asnumpy()[1 : size - 2]
    )


def test_in_field_with_non_zero_domain_start(cartesian_case):
    @gtx.field_operator
    def identity(a: IField) -> IField:
        return a

    size = cartesian_case.default_sizes[IDim]
    inp = gtx.as_field(gtx.domain({IDim: (1, 9)}), np.full(8, 42.0))
    out = gtx.zeros({IDim: size})
    ref = out.asnumpy().copy()
    ref[1:9] = 42.0
    cases.verify(
        cartesian_case, identity, inp, out=out, ref=ref,
        domain={IDim: (1, 9)},
    )
