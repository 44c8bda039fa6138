"""Named-collection feature matrix (ported behaviors from
/root/reference/tests/next_tests/integration_tests/feature_tests/
ffront_tests/test_named_collections.py: collections constructed outside
and inside operators, nested mixing with tuples, scan carries, where /
concat_where over collections). The reference accepts raw dataclasses;
here the ``@named_collection`` decorator provides the pytree
registration (NamedTuples are pytrees natively)."""

from typing import NamedTuple

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import concat_where, named_collection, where

from . import cases
from .cases import (
    IDim,
    IJField,
    JDim,
    KDim,
    cartesian_case,  # noqa: F401 (fixture)
)


class VelTuple(NamedTuple):
    u: gtx.Field[gtx.Dims[IDim, JDim], np.float64]
    v: gtx.Field[gtx.Dims[IDim, JDim], np.float64]


@named_collection
class VelClass:
    u: object
    v: object


def _uv(case):
    rng = np.random.default_rng(11)
    ni = case.default_sizes[IDim]
    nj = case.default_sizes[JDim]
    u = gtx.as_field([IDim, JDim], rng.random((ni, nj)))
    v = gtx.as_field([IDim, JDim], rng.random((ni, nj)))
    return u, v


def test_named_tuple_constructed_outside(cartesian_case):
    @gtx.field_operator
    def testee(vel: VelTuple) -> IJField:
        return vel.u + vel.v

    u, v = _uv(cartesian_case)
    out = gtx.zeros({IDim: u.shape[0], JDim: u.shape[1]})
    cases.verify(
        cartesian_case, testee, VelTuple(u=u, v=v), out=out,
        ref=u.asnumpy() + v.asnumpy(),
    )


def test_collection_class_constructed_outside(cartesian_case):
    @gtx.field_operator
    def testee(vel: VelClass) -> IJField:
        return vel.u + vel.v

    u, v = _uv(cartesian_case)
    out = gtx.zeros({IDim: u.shape[0], JDim: u.shape[1]})
    cases.verify(
        cartesian_case, testee, VelClass(u=u, v=v), out=out,
        ref=u.asnumpy() + v.asnumpy(),
    )


def test_named_tuple_constructed_inside(cartesian_case):
    @gtx.field_operator
    def testee(vel: tuple[IJField, IJField]) -> VelTuple:
        # order swapped to show kwargs work
        return VelTuple(v=vel[0] - vel[1], u=vel[0] + vel[1])

    u, v = _uv(cartesian_case)
    shape = u.shape
    out = VelTuple(
        u=gtx.zeros({IDim: shape[0], JDim: shape[1]}),
        v=gtx.zeros({IDim: shape[0], JDim: shape[1]}),
    )
    cases.run(cartesian_case, testee, (u, v), out=out)
    np.testing.assert_allclose(out.u.asnumpy(), u.asnumpy() + v.asnumpy())
    np.testing.assert_allclose(out.v.asnumpy(), u.asnumpy() - v.asnumpy())


def test_nested_mixed_collections(cartesian_case):
    class Pack(NamedTuple):
        vel: VelTuple
        w: gtx.Field[gtx.Dims[IDim, JDim], np.float64]

    @gtx.field_operator
    def testee(pack: Pack) -> IJField:
        return pack.vel.u + pack.vel.v * pack.w

    u, v = _uv(cartesian_case)
    w = gtx.as_field([IDim, JDim], np.full(u.shape, 2.0))
    out = gtx.zeros({IDim: u.shape[0], JDim: u.shape[1]})
    cases.verify(
        cartesian_case, testee, Pack(vel=VelTuple(u=u, v=v), w=w), out=out,
        ref=u.asnumpy() + v.asnumpy() * 2.0,
    )


def test_scan_with_named_tuple_carry(cartesian_case):
    class Carry(NamedTuple):
        total: float
        prev: float

    @gtx.scan_operator(axis=KDim, init=Carry(total=0.0, prev=0.0), forward=True)
    def scan_op(carry: Carry, a: float) -> Carry:
        return Carry(total=carry.total + a, prev=a)

    nk = cartesian_case.default_sizes[KDim]
    rng = np.random.default_rng(12)
    a = gtx.as_field([KDim], rng.random(nk))
    out = (gtx.zeros({KDim: nk}), gtx.zeros({KDim: nk}))
    cases.run(cartesian_case, scan_op, a, out=out)
    np.testing.assert_allclose(out[0].asnumpy(), np.cumsum(a.asnumpy()))
    np.testing.assert_allclose(out[1].asnumpy(), a.asnumpy())


def test_where_over_collection(cartesian_case):
    @gtx.field_operator
    def testee(
        mask: gtx.Field[gtx.Dims[IDim, JDim], bool], vel: VelTuple
    ) -> VelTuple:
        return where(mask, vel, VelTuple(u=vel.v, v=vel.u))

    u, v = _uv(cartesian_case)
    rng = np.random.default_rng(13)
    m = rng.random(u.shape) > 0.5
    mask = gtx.as_field([IDim, JDim], m)
    out = VelTuple(
        u=gtx.zeros({IDim: u.shape[0], JDim: u.shape[1]}),
        v=gtx.zeros({IDim: u.shape[0], JDim: u.shape[1]}),
    )
    cases.run(cartesian_case, testee, mask, VelTuple(u=u, v=v), out=out)
    np.testing.assert_allclose(
        out.u.asnumpy(), np.where(m, u.asnumpy(), v.asnumpy())
    )
    np.testing.assert_allclose(
        out.v.asnumpy(), np.where(m, v.asnumpy(), u.asnumpy())
    )


def test_concat_where_over_collection(cartesian_case):
    KField64 = gtx.Field[gtx.Dims[KDim], np.float64]

    class Pair(NamedTuple):
        a: KField64
        b: KField64

    @gtx.field_operator
    def testee(x: Pair, y: Pair) -> Pair:
        return concat_where(KDim < 3, x, y)

    nk = cartesian_case.default_sizes[KDim]
    rng = np.random.default_rng(14)
    xa, xb = rng.random(nk), rng.random(nk)
    ya, yb = rng.random(nk), rng.random(nk)
    x = Pair(a=gtx.as_field([KDim], xa), b=gtx.as_field([KDim], xb))
    y = Pair(a=gtx.as_field([KDim], ya), b=gtx.as_field([KDim], yb))
    out = Pair(a=gtx.zeros({KDim: nk}), b=gtx.zeros({KDim: nk}))
    cases.run(cartesian_case, testee, x, y, out=out)
    exp_a = np.where(np.arange(nk) < 3, xa, ya)
    exp_b = np.where(np.arange(nk) < 3, xb, yb)
    np.testing.assert_allclose(out.a.asnumpy(), exp_a)
    np.testing.assert_allclose(out.b.asnumpy(), exp_b)
