"""Tuple-argument / tuple-return feature matrix (ported behaviors from
/root/reference/tests/next_tests/integration_tests/feature_tests/
ffront_tests/test_tuples.py: multicopy, scalar tuples, mixed
field/scalar tuples, dim-promoting tuple elements, nested returns,
star unpacking, unpack arity errors)."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import broadcast, neighbor_sum

from . import cases
from .cases import (
    E2V,
    V2E,
    EField,
    IDim,
    IField,
    IJField,
    IJKField,
    JDim,
    V2EDim,
    Vertex,
    cartesian_case,  # noqa: F401 (fixture)
    unstructured_case,  # noqa: F401 (fixture)
)

int32 = gtx.int32
float64 = gtx.float64


def test_multicopy(cartesian_case):
    @gtx.field_operator
    def testee(a: IJKField, b: IJKField) -> tuple[IJKField, IJKField]:
        return a, b

    cases.verify_with_default_data(cartesian_case, testee, ref=lambda a, b: (a, b))


def test_tuples_of_scalars_fold(cartesian_case):
    @gtx.field_operator
    def testee(a: IJKField, b: IJKField) -> IJKField:
        inps = a, b
        scalars = 1.3, 5.0, 3.4
        return (inps[0] * scalars[0] + inps[1] * scalars[1]) * scalars[2]

    cases.verify_with_default_data(
        cartesian_case, testee, ref=lambda a, b: (a * 1.3 + b * 5.0) * 3.4
    )


def test_scalar_tuple_arg(unstructured_case):
    @gtx.field_operator
    def testee(a: tuple[np.int64, tuple[np.int64, np.int64]]):
        return broadcast(a[0] + 2 * a[1][0] + 3 * a[1][1], (Vertex,))

    nv = unstructured_case.default_sizes[Vertex]
    out = gtx.zeros({Vertex: nv}, dtype=np.int64)
    cases.verify(
        unstructured_case,
        testee,
        (np.int64(7), (np.int64(11), np.int64(13))),
        ref=np.full(nv, 7 + 2 * 11 + 3 * 13, dtype=np.int64),
        out=out,
    )


def test_mixed_field_scalar_tuple_arg(cartesian_case):
    @gtx.field_operator
    def testee(a: tuple[np.float64, tuple[np.float64, IField, np.float64]]) -> IField:
        return a[0] + 2.0 * a[1][0] + 3.0 * a[1][1] + 5.0 * a[1][2]

    n = cartesian_case.default_sizes[IDim]
    f = cases.allocate(cartesian_case, testee, "a").unique()()
    # f is a tuple mirroring the annotation: (scalar, (scalar, field, scalar))
    s0, (s1, fld, s2) = f
    out = cases.allocate(cartesian_case, testee, cases.RETURN).zeros()()
    cases.verify(
        cartesian_case,
        testee,
        (s0, (s1, fld, s2)),
        ref=s0 + 2.0 * s1 + 3.0 * fld.asnumpy() + 5.0 * s2,
        out=out,
    )


def test_tuple_arg_with_different_but_promotable_dims(cartesian_case):
    @gtx.field_operator
    def testee(a: tuple[IField, IJField]) -> IJField:
        return a[0] + 2.0 * a[1]

    cases.verify_with_default_data(
        cartesian_case,
        testee,
        ref=lambda a: a[0][:, np.newaxis] + 2.0 * a[1],
    )


def test_nested_tuple_return_through_call(cartesian_case):
    @gtx.field_operator
    def pack_tuple(a: IField, b: IField) -> tuple[IField, tuple[IField, IField]]:
        return (a, (a, b))

    @gtx.field_operator
    def combine(a: IField, b: IField) -> IField:
        packed = pack_tuple(a, b)
        return packed[0] + packed[1][0] + packed[1][1]

    cases.verify_with_default_data(cartesian_case, combine, ref=lambda a, b: a + a + b)


def test_tuple_return_unstructured(unstructured_case):
    @gtx.field_operator
    def testee(a: EField, b: EField):
        tmp = neighbor_sum(a(V2E), axis=V2EDim)
        tmp_2 = neighbor_sum(b(V2E), axis=V2EDim)
        return tmp, tmp_2

    nv = unstructured_case.default_sizes[Vertex]
    a = cases.allocate(unstructured_case, testee, "a").unique()()
    b = cases.allocate(unstructured_case, testee, "b").unique()()
    out = (gtx.zeros({Vertex: nv}), gtx.zeros({Vertex: nv}))
    v2e = cases.TOY_V2E_TABLE
    cases.verify(
        unstructured_case,
        testee,
        a,
        b,
        ref=(
            a.asnumpy()[v2e].sum(axis=1),
            b.asnumpy()[v2e].sum(axis=1),
        ),
        out=out,
    )


def test_nested_tuple_arg(cartesian_case):
    @gtx.field_operator
    def testee(a: tuple[tuple[IField, IField], IField]) -> IField:
        return 3.0 * a[0][0] + a[0][1] + a[1]

    cases.verify_with_default_data(
        cartesian_case, testee, ref=lambda a: 3.0 * a[0][0] + a[0][1] + a[1]
    )


def test_tuple_unpacking(cartesian_case):
    @gtx.field_operator
    def unpack(inp: IField) -> tuple[IField, IField, IField, IField]:
        a, b, c, d = (inp + 2.0, inp + 3.0, inp + 5.0, inp + 7.0)
        return a, b, c, d

    cases.verify_with_default_data(
        cartesian_case,
        unpack,
        ref=lambda inp: (inp + 2.0, inp + 3.0, inp + 5.0, inp + 7.0),
    )


def test_tuple_unpacking_star_multi(cartesian_case):
    OutType = tuple[
        IField, IField, IField, IField,
        IField, IField, IField, IField,
        IField, IField, IField, IField,
    ]

    @gtx.field_operator
    def unpack(inp: IField) -> OutType:
        *a, a2, a3 = (inp, inp + 1.0, inp + 2.0, inp + 3.0)
        b1, *b, b3 = (inp + 4.0, inp + 5.0, inp + 6.0, inp + 7.0)
        c1, c2, *c = (inp + 8.0, inp + 9.0, inp + 10.0, inp + 11.0)
        return (a[0], a[1], a2, a3, b1, b[0], b[1], b3, c1, c2, c[0], c[1])

    cases.verify_with_default_data(
        cartesian_case,
        unpack,
        ref=lambda inp: tuple(inp + float(i) for i in range(12)),
    )


def test_tuple_unpacking_too_many_values():
    """Arity mismatch is rejected at decoration time (type deduction),
    earlier than the reference's lowering-time error."""
    with pytest.raises(gtx.DSLTypeError, match="(?i)unpack"):

        @gtx.field_operator
        def _star_unpack(inp: IField) -> IField:
            a, b, c = (inp, inp + 1.0, inp + 2.0, inp + 3.0)
            return a


def test_tuple_unpacking_too_few_values():
    with pytest.raises(gtx.DSLTypeError, match="(?i)unpack"):

        @gtx.field_operator
        def _invalid_unpack(inp: IField) -> IField:
            a, b, c = (inp, inp + 1.0)
            return a
