"""Field dunder-operator matrix (reference
unit_tests/embedded_tests/test_nd_array_field.py arithmetic cases:
every operator, reflected variants, scalar operands, dim promotion)."""

import operator

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import Dimension

I = Dimension("Ia")
J = Dimension("Ja")

BINOPS = {
    "add": operator.add,
    "sub": operator.sub,
    "mul": operator.mul,
    "truediv": operator.truediv,
    "pow": operator.pow,
    "mod": operator.mod,
    "floordiv": operator.floordiv,
}
CMPS = {
    "lt": operator.lt,
    "le": operator.le,
    "gt": operator.gt,
    "ge": operator.ge,
    "eq": operator.eq,
    "ne": operator.ne,
}


def _fields():
    rng = np.random.default_rng(11)
    a = rng.random(6) + 0.5
    b = rng.random(6) + 0.5
    return a, b, gtx.as_field([I], a), gtx.as_field([I], b)


@pytest.mark.parametrize("name", sorted(BINOPS))
def test_field_field_binop(name):
    op = BINOPS[name]
    a, b, fa, fb = _fields()
    res = op(fa, fb)
    np.testing.assert_allclose(np.asarray(res.ndarray), op(a, b), rtol=1e-12)


@pytest.mark.parametrize("name", sorted(BINOPS))
def test_field_scalar_and_reflected(name):
    op = BINOPS[name]
    a, _, fa, _ = _fields()
    np.testing.assert_allclose(np.asarray(op(fa, 2.0).ndarray), op(a, 2.0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(op(2.0, fa).ndarray), op(2.0, a), rtol=1e-12)


@pytest.mark.parametrize("name", sorted(CMPS))
def test_field_comparisons(name):
    op = CMPS[name]
    a, b, fa, fb = _fields()
    res = op(fa, fb)
    assert res.dtype == np.dtype(bool)
    np.testing.assert_array_equal(np.asarray(res.ndarray), op(a, b))


def test_unary_ops():
    a, _, fa, _ = _fields()
    np.testing.assert_allclose(np.asarray((-fa).ndarray), -a)
    np.testing.assert_allclose(np.asarray((+fa).ndarray), a)
    flags = gtx.as_field([I], a > 0.7)
    np.testing.assert_array_equal(np.asarray((~flags).ndarray), ~(a > 0.7))


def test_bool_and_or_xor():
    a, b, _, _ = _fields()
    fa = gtx.as_field([I], a > 0.7)
    fb = gtx.as_field([I], b > 0.7)
    np.testing.assert_array_equal(np.asarray((fa & fb).ndarray), (a > 0.7) & (b > 0.7))
    np.testing.assert_array_equal(np.asarray((fa | fb).ndarray), (a > 0.7) | (b > 0.7))
    np.testing.assert_array_equal(np.asarray((fa ^ fb).ndarray), (a > 0.7) ^ (b > 0.7))


def test_cross_dim_promotion_broadcasts():
    rng = np.random.default_rng(12)
    ai = rng.random(4)
    bj = rng.random(3)
    res = gtx.as_field([I], ai) + gtx.as_field([J], bj)
    assert res.dims == (I, J)
    np.testing.assert_allclose(np.asarray(res.ndarray), ai[:, None] + bj[None, :])


def test_domain_intersection_on_misaligned_ranges():
    rng = np.random.default_rng(13)
    a = rng.random(6)
    b = rng.random(6)
    fa = gtx.Field(gtx.domain({I: (0, 6)}), np.asarray(a))
    fb = gtx.Field(gtx.domain({I: (2, 8)}), np.asarray(b))
    res = fa + fb
    assert res.domain[I].unit_range == gtx.UnitRange(2, 6)
    np.testing.assert_allclose(np.asarray(res.ndarray), a[2:6] + b[0:4])
