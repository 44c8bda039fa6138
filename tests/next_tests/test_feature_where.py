"""`where` builtin corner cases (ported behaviors from
/root/reference/tests/next_tests/integration_tests/feature_tests/
ffront_tests/test_where.py: K-offset reads under a mask, same-size
boundary selection, tuple and nested-tuple branches, scalar promotion,
mask-from-comparison, shifted where results)."""

import functools

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import broadcast, where

from . import cases
from .cases import (
    IBoolField,
    IDim,
    IField,
    IJField,
    IJKField,
    JDim,
    KDim,
    KField,
    Koff,
    cartesian_case,  # noqa: F401 (fixture)
)


def test_where_k_offset(cartesian_case):
    @gtx.field_operator
    def fieldop_where_k_offset(
        inp: gtx.Field[gtx.Dims[IDim, KDim], np.float64],
        k_index: gtx.Field[gtx.Dims[KDim], np.int64],
    ) -> gtx.Field[gtx.Dims[IDim, KDim], np.float64]:
        return where(k_index > 0, inp(Koff[-1]), 2.0)

    inp = cases.allocate(cartesian_case, fieldop_where_k_offset, "inp")()
    k_index = cases.allocate(
        cartesian_case, fieldop_where_k_offset, "k_index"
    ).index()()
    nk = cartesian_case.default_sizes[KDim]
    ni = cartesian_case.default_sizes[IDim]
    # domain restricted to K >= 1 so the K-1 read stays in bounds
    out = gtx.zeros({IDim: ni, KDim: (1, nk)})
    ref = np.where(
        k_index.asnumpy()[1:] > 0, inp.asnumpy()[:, :-1], 2.0
    )
    cases.verify(cartesian_case, fieldop_where_k_offset, inp, k_index, out=out, ref=ref)


def test_same_size_fields(cartesian_case):
    @gtx.field_operator
    def testee(k: KField, interior: IJKField, boundary: IJKField) -> IJKField:
        return where(k == 0.0, boundary, interior)

    k = cases.allocate(cartesian_case, testee, "k").index()()
    interior = cases.allocate(cartesian_case, testee, "interior")()
    boundary = cases.allocate(cartesian_case, testee, "boundary")()
    out = cases.allocate(cartesian_case, testee, cases.RETURN)()
    ref = np.where(
        k.asnumpy()[np.newaxis, np.newaxis, :] == 0,
        boundary.asnumpy(),
        interior.asnumpy(),
    )
    cases.verify(cartesian_case, testee, k, interior, boundary, out=out, ref=ref)


def test_with_tuples(cartesian_case):
    @gtx.field_operator
    def testee(
        k: KField,
        interior0: IJKField,
        interior1: IJKField,
        interior2: IJKField,
        boundary0: IJField,
        boundary1: IJField,
        boundary2: IJField,
    ) -> tuple[IJKField, tuple[IJKField, IJKField]]:
        return where(
            broadcast(k, (IDim, JDim, KDim)) == 0.0,
            (boundary0, (boundary1, boundary2)),
            (interior0, (interior1, interior2)),
        )

    k = cases.allocate(cartesian_case, testee, "k").index()()
    interiors = tuple(
        cases.allocate(cartesian_case, testee, f"interior{i}").unique()()
        for i in range(3)
    )
    boundaries = tuple(
        cases.allocate(cartesian_case, testee, f"boundary{i}").unique()()
        for i in range(3)
    )
    out = cases.allocate(cartesian_case, testee, cases.RETURN)()
    refs = tuple(
        np.where(
            k.asnumpy()[np.newaxis, np.newaxis, :] == 0,
            boundary.asnumpy()[:, :, np.newaxis],
            interior.asnumpy(),
        )
        for boundary, interior in zip(boundaries, interiors)
    )
    cases.verify(
        cartesian_case,
        testee,
        k,
        *interiors,
        *boundaries,
        out=out,
        ref=(refs[0], (refs[1], refs[2])),
    )


def test_conditional_nested_tuple(cartesian_case):
    @gtx.field_operator
    def conditional_nested_tuple(
        mask: IBoolField, a: IField, b: IField
    ) -> tuple[tuple[IField, IField], tuple[IField, IField]]:
        return where(mask, ((a, b), (b, a)), ((5.0, 7.0), (7.0, 5.0)))

    size = cartesian_case.default_sizes[IDim]
    rng = np.random.default_rng(3)
    mask = cartesian_case.as_field([IDim], rng.random(size) > 0.5)
    a = cases.allocate(cartesian_case, conditional_nested_tuple, "a").unique()()
    b = cases.allocate(cartesian_case, conditional_nested_tuple, "b").unique()()
    w = functools.partial(np.where, mask.asnumpy())
    cases.verify(
        cartesian_case,
        conditional_nested_tuple,
        mask,
        a,
        b,
        out=cases.allocate(cartesian_case, conditional_nested_tuple, cases.RETURN)(),
        ref=(
            (w(a.asnumpy(), np.full(size, 5.0)), w(b.asnumpy(), np.full(size, 7.0))),
            (w(b.asnumpy(), np.full(size, 7.0)), w(a.asnumpy(), np.full(size, 5.0))),
        ),
    )


def test_conditional(cartesian_case):
    @gtx.field_operator
    def conditional(mask: IBoolField, a: IField, b: IField) -> IField:
        return where(mask, a, b)

    size = cartesian_case.default_sizes[IDim]
    rng = np.random.default_rng(4)
    mask = cartesian_case.as_field([IDim], rng.random(size) > 0.5)
    a = cases.allocate(cartesian_case, conditional, "a")()
    b = cases.allocate(cartesian_case, conditional, "b")()
    out = cases.allocate(cartesian_case, conditional, cases.RETURN)()
    cases.verify(
        cartesian_case, conditional, mask, a, b, out=out,
        ref=np.where(mask.asnumpy(), a.asnumpy(), b.asnumpy()),
    )


def test_conditional_scalar_promotion(cartesian_case):
    @gtx.field_operator
    def conditional_promotion(mask: IBoolField, a: IField) -> IField:
        return where(mask, a, 10.0)

    size = cartesian_case.default_sizes[IDim]
    rng = np.random.default_rng(5)
    mask = cartesian_case.as_field([IDim], rng.random(size) > 0.5)
    a = cases.allocate(cartesian_case, conditional_promotion, "a")()
    out = cases.allocate(cartesian_case, conditional_promotion, cases.RETURN)()
    cases.verify(
        cartesian_case, conditional_promotion, mask, a, out=out,
        ref=np.where(mask.asnumpy(), a.asnumpy(), 10.0),
    )


def test_conditional_compareop_mask(cartesian_case):
    @gtx.field_operator
    def conditional_compare(a: IField) -> IField:
        return where(a != a, a, 10.0)

    cases.verify_with_default_data(
        cartesian_case, conditional_compare, ref=lambda a: np.where(a != a, a, 10.0)
    )


def test_conditional_shifted(cartesian_case):
    @gtx.field_operator
    def conditional_shifted(mask: IBoolField, a: IField, b: IField) -> IField:
        tmp = where(mask, a, b)
        return tmp(IDim + 1)

    size = cartesian_case.default_sizes[IDim]
    rng = np.random.default_rng(6)
    mask = cartesian_case.as_field([IDim], rng.random(size + 1) > 0.5)
    a = cases.allocate(cartesian_case, conditional_shifted, "a").extend(
        {IDim: (0, 1)}
    ).unique()()
    b = cases.allocate(cartesian_case, conditional_shifted, "b").extend(
        {IDim: (0, 1)}
    ).unique()()
    out = gtx.zeros({IDim: size})
    cases.verify(
        cartesian_case, conditional_shifted, mask, a, b, out=out,
        ref=np.where(mask.asnumpy(), a.asnumpy(), b.asnumpy())[1:],
    )
