"""Neighbor-reduction feature matrix (ported behaviors from
/root/reference/tests/next_tests/integration_tests/feature_tests/
ffront_tests/test_reductions.py: max/min over, reduction expressions
in calls, shared subexpressions, where inside reductions (plain /
tuple / scalar branches), dim promotion, composed unstructured shifts,
nested reductions, tuples with local fields, ternary-fed reductions,
local indexing of premapped fields)."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import max_over, min_over, neighbor_sum, where

from . import cases
from .cases import (
    E2V,
    E2VDim,
    EField,
    KDim,
    V2E,
    V2EDim,
    VField,
    Vertex,
    Edge,
    unstructured_case,  # noqa: F401 (fixture)
)

V2E_TABLE = cases.TOY_V2E_TABLE
E2V_TABLE = cases.TOY_E2V_TABLE


def test_maxover_execution(unstructured_case):
    @gtx.field_operator
    def testee(edge_f: EField) -> VField:
        return max_over(edge_f(V2E), axis=V2EDim)

    cases.verify_with_default_data(
        unstructured_case, testee,
        ref=lambda edge_f: np.max(edge_f[V2E_TABLE], axis=1),
    )


def test_minover_execution(unstructured_case):
    @gtx.field_operator
    def testee(edge_f: EField) -> VField:
        return min_over(edge_f(V2E), axis=V2EDim)

    cases.verify_with_default_data(
        unstructured_case, testee,
        ref=lambda edge_f: np.min(edge_f[V2E_TABLE], axis=1),
    )


def test_reduction_expression_in_call(unstructured_case):
    @gtx.field_operator
    def reduce_expr(edge_f: EField) -> VField:
        tmp_nbh_tup = edge_f(V2E), edge_f(V2E)
        tmp_nbh = tmp_nbh_tup[0]
        return 3.0 * neighbor_sum(-edge_f(V2E) * tmp_nbh * 2.0, axis=V2EDim)

    @gtx.program
    def fencil(edge_f, out):
        reduce_expr(edge_f, out=out)

    edge_f = cases.allocate(unstructured_case, reduce_expr, "edge_f").unique()()
    nv = unstructured_case.default_sizes[Vertex]
    out = gtx.zeros({Vertex: nv})
    cases.verify(
        unstructured_case, fencil, edge_f, out, inout=out,
        ref=3.0 * np.sum(-(edge_f.asnumpy()[V2E_TABLE] ** 2) * 2.0, axis=1),
    )


def test_reduction_with_common_expression(unstructured_case):
    @gtx.field_operator
    def testee(flux: EField) -> VField:
        return neighbor_sum(flux(V2E) + flux(V2E), axis=V2EDim)

    cases.verify_with_default_data(
        unstructured_case, testee,
        ref=lambda flux: np.sum(flux[V2E_TABLE] * 2.0, axis=1),
    )


def test_reduction_expression_with_where(unstructured_case):
    @gtx.field_operator
    def testee(mask: gtx.Field[gtx.Dims[Vertex], bool], inp: EField) -> VField:
        return neighbor_sum(where(mask, inp(V2E), inp(V2E)), axis=V2EDim)

    rng = np.random.default_rng(21)
    nv = unstructured_case.default_sizes[Vertex]
    mask = unstructured_case.as_field([Vertex], rng.random(nv) > 0.5)
    inp = cases.allocate(unstructured_case, testee, "inp").unique()()
    out = gtx.zeros({Vertex: nv})
    cases.verify(
        unstructured_case, testee, mask, inp, out=out,
        ref=np.sum(inp.asnumpy()[V2E_TABLE], axis=1),
    )


def test_reduction_expression_with_where_and_tuples(unstructured_case):
    @gtx.field_operator
    def testee(mask: gtx.Field[gtx.Dims[Vertex], bool], inp: EField) -> VField:
        return neighbor_sum(
            where(mask, (inp(V2E), inp(V2E)), (inp(V2E), inp(V2E)))[1],
            axis=V2EDim,
        )

    rng = np.random.default_rng(22)
    nv = unstructured_case.default_sizes[Vertex]
    mask = unstructured_case.as_field([Vertex], rng.random(nv) > 0.5)
    inp = cases.allocate(unstructured_case, testee, "inp").unique()()
    out = gtx.zeros({Vertex: nv})
    cases.verify(
        unstructured_case, testee, mask, inp, out=out,
        ref=np.sum(inp.asnumpy()[V2E_TABLE], axis=1),
    )


def test_reduction_expression_with_where_and_scalar(unstructured_case):
    @gtx.field_operator
    def testee(mask: gtx.Field[gtx.Dims[Vertex], bool], inp: EField) -> VField:
        return neighbor_sum(inp(V2E) + where(mask, inp(V2E), 1.0), axis=V2EDim)

    rng = np.random.default_rng(23)
    nv = unstructured_case.default_sizes[Vertex]
    m = rng.random(nv) > 0.5
    mask = unstructured_case.as_field([Vertex], m)
    inp = cases.allocate(unstructured_case, testee, "inp").unique()()
    out = gtx.zeros({Vertex: nv})
    gathered = inp.asnumpy()[V2E_TABLE]
    ref = np.sum(gathered + np.where(m[:, None], gathered, 1.0), axis=1)
    cases.verify(unstructured_case, testee, mask, inp, out=out, ref=ref)


def test_promotion_unstructured_k(unstructured_case):
    @gtx.field_operator
    def promotion(
        inp1: gtx.Field[gtx.Dims[Edge, KDim], np.float64],
        inp2: gtx.Field[gtx.Dims[KDim], np.float64],
    ) -> gtx.Field[gtx.Dims[Edge, KDim], np.float64]:
        return inp1 / inp2

    ne = unstructured_case.default_sizes[Edge]
    rng = np.random.default_rng(24)
    inp1 = gtx.as_field([Edge, KDim], rng.random((ne, 5)) + 1.0)
    inp2 = gtx.as_field([KDim], rng.random(5) + 1.0)
    out = gtx.zeros({Edge: ne, KDim: 5})
    cases.verify(
        unstructured_case, promotion, inp1, inp2, out=out,
        ref=inp1.asnumpy() / inp2.asnumpy()[None, :],
    )


def test_composed_unstructured_shift(unstructured_case):
    @gtx.field_operator
    def shift_e2v(inp: VField) -> EField:
        return inp(E2V[0])

    @gtx.field_operator
    def composed_flat(inp: VField):
        return inp(E2V[0])(V2E[0])

    @gtx.field_operator
    def composed_intermediate(inp: VField):
        tmp = inp(E2V[0])
        return tmp(V2E[0])

    @gtx.field_operator
    def composed_through_call(inp: VField):
        return shift_e2v(inp)(V2E[0])

    inp = cases.allocate(unstructured_case, shift_e2v, "inp").unique()()
    nv = unstructured_case.default_sizes[Vertex]
    ref = inp.asnumpy()[E2V_TABLE[:, 0]][V2E_TABLE[:, 0]]
    for op in (composed_flat, composed_intermediate, composed_through_call):
        out = gtx.zeros({Vertex: nv})
        cases.verify(unstructured_case, op, inp, out=out, ref=ref)


def test_nested_reduction(unstructured_case):
    @gtx.field_operator
    def testee(a: VField) -> VField:
        tmp = neighbor_sum(a(E2V), axis=E2VDim)
        tmp_2 = neighbor_sum(tmp(V2E), axis=V2EDim)
        return tmp_2

    cases.verify_with_default_data(
        unstructured_case, testee,
        ref=lambda a: np.sum(
            np.sum(a[E2V_TABLE], axis=1)[V2E_TABLE], axis=1
        ),
    )


def test_tuple_with_local_field_in_reduction_shifted(unstructured_case):
    @gtx.field_operator
    def reduce_tuple_element(e: EField, v: VField) -> EField:
        tup = e(V2E), v
        red = neighbor_sum(tup[0] + v, axis=V2EDim)
        tmp = red(E2V[0])
        return tmp

    e = cases.allocate(unstructured_case, reduce_tuple_element, "e").unique()()
    v = cases.allocate(unstructured_case, reduce_tuple_element, "v").unique()()
    ne = unstructured_case.default_sizes[Edge]
    out = gtx.zeros({Edge: ne})
    red = np.sum(e.asnumpy()[V2E_TABLE] + v.asnumpy()[:, None], axis=1)
    cases.verify(
        unstructured_case, reduce_tuple_element, e, v, out=out,
        ref=red[E2V_TABLE[:, 0]],
    )


def test_ternary_builtin_neighbor_sum(unstructured_case):
    @gtx.field_operator
    def testee(a: EField, b: EField) -> VField:
        tmp = neighbor_sum(b(V2E) if 2 < 3 else a(V2E), axis=V2EDim)
        return tmp

    cases.verify_with_default_data(
        unstructured_case, testee,
        ref=lambda a, b: np.sum(b[V2E_TABLE], axis=1),
    )


def test_local_index_premapped_field(unstructured_case):
    @gtx.field_operator
    def testee(inp: gtx.Field[gtx.Dims[Edge], np.int64]):
        shifted = inp(V2E)
        return (
            shifted[V2EDim(0)] + shifted[V2EDim(1)]
            + shifted[V2EDim(2)] + shifted[V2EDim(3)]
        )

    inp = cases.allocate(unstructured_case, testee, "inp").unique()()
    nv = unstructured_case.default_sizes[Vertex]
    out = gtx.zeros({Vertex: nv}, dtype=np.int64)
    cases.verify(
        unstructured_case, testee, inp, out=out,
        ref=np.sum(inp.asnumpy()[V2E_TABLE], axis=1),
    )
