"""FOAST power unrolling + tuple-get collapse (reference
iterator/transforms/power_unrolling.py, collapse_tuple.py analogs)."""

import numpy as np

import gt4py_tpu.next as gtx
from gt4py_tpu.next.foast import foast_source

I = gtx.Dimension("Ipw")


def test_power_unrolls_to_multiplications():
    @gtx.field_operator
    def powers(a):
        return a**3 + a**2 + a**0 + a**1

    src = foast_source(powers)
    assert "**" not in src
    f = gtx.as_field([I], np.linspace(0.5, 2.0, 8))
    out = gtx.zeros({I: 8})
    powers(f, out=out)
    x = f.asnumpy()
    np.testing.assert_allclose(out.asnumpy(), x**3 + x**2 + 1.0 + x, rtol=1e-14)


def test_fractional_and_large_powers_stay():
    @gtx.field_operator
    def frac(a):
        return a**0.5 + a**9

    src = foast_source(frac)
    assert src.count("**") == 2
    f = gtx.as_field([I], np.linspace(0.5, 2.0, 8))
    out = gtx.zeros({I: 8})
    frac(f, out=out)
    x = f.asnumpy()
    np.testing.assert_allclose(out.asnumpy(), x**0.5 + x**9, rtol=1e-12)


def test_tuple_get_collapses():
    @gtx.field_operator
    def pick(a, b):
        pair = (a * 2.0, b + 1.0)
        return pair[0] + pair[1]

    src = foast_source(pick)
    assert "[0]" not in src and "[1]" not in src
    fa = gtx.as_field([I], np.arange(6.0))
    fb = gtx.as_field([I], np.ones(6))
    out = gtx.zeros({I: 6})
    pick(fa, fb, out=out)
    np.testing.assert_allclose(out.asnumpy(), np.arange(6.0) * 2.0 + 2.0)


def test_unroll_powers_opt_out():
    @gtx.field_operator
    def cube(a):
        return a**3

    src = foast_source(cube.with_transforms(unroll_powers=False))
    assert "**" in src


def test_tuple_collapse_respects_reassignment():
    """Element expressions reading a later-reassigned variable must NOT
    substitute past the reassignment."""

    @gtx.field_operator
    def hazard(a, b):
        pair = (a * 2.0, b)
        a = a + 100.0  # noqa: F841 — reassignment invalidates the binding
        return pair[0] + a * 0.0

    fa = gtx.as_field([I], np.arange(5.0))
    fb = gtx.as_field([I], np.ones(5))
    out = gtx.zeros({I: 5})
    hazard(fa, fb, out=out)
    # pair[0] is the OLD a * 2
    np.testing.assert_allclose(out.asnumpy(), np.arange(5.0) * 2.0)


def test_tuple_collapse_through_name_and_dce():
    @gtx.field_operator
    def chained(a, b):
        pair = (a + b, a - b)
        s = pair[0]
        d = pair[1]
        return s * d

    src = foast_source(chained)
    assert "pair[" not in src  # all gets collapsed; binding DCE'd
    fa = gtx.as_field([I], np.arange(4.0) + 1.0)
    fb = gtx.as_field([I], np.ones(4))
    out = gtx.zeros({I: 4})
    chained(fa, fb, out=out)
    x, y = np.arange(4.0) + 1.0, np.ones(4)
    np.testing.assert_allclose(out.asnumpy(), (x + y) * (x - y))
