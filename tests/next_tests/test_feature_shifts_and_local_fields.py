"""Cartesian shifts, dynamic offset fields, and external local
(sparse) fields (ported behaviors from /root/reference/tests/
next_tests/integration_tests/feature_tests/ffront_tests/
test_cartesian_shifts.py and test_external_local_field.py)."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import astype, neighbor_sum
from gt4py_tpu.next.experimental import as_offset

from . import cases
from .cases import (
    Edge,
    IDim,
    IJKField,
    IKField,
    KDim,
    V2E,
    V2EDim,
    Vertex,
    cartesian_case,  # noqa: F401 (fixture)
    unstructured_case,  # noqa: F401 (fixture)
)

Ioff = gtx.FieldOffset("Ioff", source=IDim, target=(IDim,))
Koff = gtx.FieldOffset("Koff", source=KDim, target=(KDim,))


def test_cartesian_shift(cartesian_case):
    @gtx.field_operator
    def testee(a: IJKField) -> IJKField:
        return a(IDim + 1)

    a = cases.allocate(cartesian_case, testee, "a").extend({IDim: (0, 1)}).unique()()
    out = cases.allocate(cartesian_case, testee, cases.RETURN)()
    cases.verify(cartesian_case, testee, a, out=out, ref=a.asnumpy()[1:])


def test_fold_shifts(cartesian_case):
    """Shifting the result of an addition composes the offsets."""

    @gtx.field_operator
    def testee(a: IJKField, b: IJKField) -> IJKField:
        tmp = a + b(IDim + 1)
        return tmp(IDim + 1)

    a = cases.allocate(cartesian_case, testee, "a").extend({IDim: (0, 1)}).unique()()
    b = cases.allocate(cartesian_case, testee, "b").extend({IDim: (0, 2)}).unique()()
    out = cases.allocate(cartesian_case, testee, cases.RETURN)()
    cases.verify(
        cartesian_case, testee, a, b, out=out,
        ref=a.asnumpy()[1:] + b.asnumpy()[2:],
    )


def test_offset_field(cartesian_case):
    """Dynamic shifts through as_offset match static composed shifts."""

    @gtx.field_operator
    def testee(a: IKField, offset_field: gtx.Field[gtx.Dims[IDim, KDim], np.int64]):
        a_i = a(as_offset(Ioff, offset_field))
        a_i_k = a_i(as_offset(Koff, offset_field))
        b_i = a(IDim + 1)
        b_i_k = b_i(KDim + 1)
        return a_i_k == b_i_k

    ni = cartesian_case.default_sizes[IDim]
    nk = cartesian_case.default_sizes[KDim]
    a = cases.allocate(cartesian_case, testee, "a").extend(
        {IDim: (0, 1), KDim: (0, 1)}
    ).unique()()
    offset_field = gtx.as_field(
        [IDim, KDim], np.ones((ni, nk + 1), dtype=np.int64)
    )
    out = gtx.zeros({IDim: ni, KDim: nk}, dtype=bool)
    cases.verify(
        cartesian_case, testee, a, offset_field, out=out,
        ref=np.full((ni, nk), True),
        comparison=lambda ref, got: np.all(cases._asnumpy(got) == ref),
    )


def test_external_local_field(unstructured_case):
    @gtx.field_operator
    def testee(
        inp: gtx.Field[gtx.Dims[Vertex, V2EDim], np.int64],
        ones: gtx.Field[gtx.Dims[Edge], np.int64],
    ):
        return neighbor_sum(inp * ones(V2E), axis=V2EDim)

    v2e_table = cases.TOY_V2E_TABLE
    inp = unstructured_case.as_field([Vertex, V2EDim], v2e_table)
    ones = gtx.as_field([Edge], np.ones(unstructured_case.default_sizes[Edge], dtype=np.int64))
    out = gtx.zeros({Vertex: unstructured_case.default_sizes[Vertex]}, dtype=np.int64)
    cases.verify(
        unstructured_case, testee, inp, ones, out=out,
        ref=np.sum(v2e_table, axis=1),
    )


def test_index_external_local_field(unstructured_case):
    @gtx.field_operator
    def testee(inp: gtx.Field[gtx.Dims[Vertex, V2EDim], np.int64]):
        return inp[V2EDim(0)] + inp[V2EDim(1)] + inp[V2EDim(2)] + inp[V2EDim(3)]

    inp = unstructured_case.as_field([Vertex, V2EDim], cases.TOY_V2E_TABLE)
    out = gtx.zeros({Vertex: unstructured_case.default_sizes[Vertex]}, dtype=np.int64)
    cases.verify(
        unstructured_case, testee, inp, out=out,
        ref=np.sum(cases.TOY_V2E_TABLE, axis=1),
    )


def test_index_external_local_field_with_cast(unstructured_case):
    @gtx.field_operator
    def testee(inp: gtx.Field[gtx.Dims[Vertex, V2EDim], np.int32]):
        inp_64 = astype(inp, gtx.int64)
        return inp_64[V2EDim(0)] + inp_64[V2EDim(1)] + inp_64[V2EDim(2)] + inp_64[V2EDim(3)]

    inp = unstructured_case.as_field(
        [Vertex, V2EDim], cases.TOY_V2E_TABLE.astype(np.int32)
    )
    out = gtx.zeros({Vertex: unstructured_case.default_sizes[Vertex]}, dtype=np.int64)
    cases.verify(
        unstructured_case, testee, inp, out=out,
        ref=np.sum(cases.TOY_V2E_TABLE, axis=1),
    )
    assert out.dtype == np.dtype(np.int64)


def test_write_local_field(unstructured_case):
    """A bare remap writes a sparse [Vertex, V2EDim] output."""

    @gtx.field_operator
    def testee(inp: gtx.Field[gtx.Dims[Edge], np.int64]):
        return inp(V2E)

    inp = cases.allocate(unstructured_case, testee, "inp").unique()()
    out = unstructured_case.as_field(
        [Vertex, V2EDim], np.zeros_like(cases.TOY_V2E_TABLE)
    )
    cases.verify(
        unstructured_case, testee, inp, out=out,
        ref=inp.asnumpy()[cases.TOY_V2E_TABLE],
    )
