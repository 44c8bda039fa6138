"""Field-operator -> cartesian-kernel bridge (SURVEY §7 step 8): the
structured subset of the field-view DSL executes through the cartesian
Pallas/XLA kernels; results must match the embedded oracle exactly."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import Dimension, DimensionKind, FieldOffset, neighbor_sum, where

IDim = Dimension("IDim")
JDim = Dimension("JDim")
KDim = Dimension("KDim", kind=DimensionKind.VERTICAL)
Ioff = FieldOffset("Ioff", source=IDim, target=(IDim,))
Joff = FieldOffset("Joff", source=JDim, target=(JDim,))
PROV = {"Ioff": IDim, "Joff": JDim}


@pytest.fixture
def rng():
    return np.random.default_rng(12)


@gtx.field_operator
def lap(phi):
    return -4.0 * phi + phi(Ioff[1]) + phi(Ioff[-1]) + phi(Joff[1]) + phi(Joff[-1])


def test_bridge_lap_matches_embedded(rng):
    n = 12
    data = rng.random((n, n, 4))
    phi = gtx.as_field([IDim, JDim, KDim], data)

    out_e = gtx.zeros({IDim: (1, n - 1), JDim: (1, n - 1), KDim: 4})
    lap.with_backend(None)(phi, out=out_e, offset_provider=PROV)

    out_p = gtx.zeros({IDim: (1, n - 1), JDim: (1, n - 1), KDim: 4})
    op = lap.with_backend("tpu:pallas")
    op(phi, out=out_p, offset_provider=PROV)
    assert op._bridge_cache and all(v is not None for v in op._bridge_cache.values())
    np.testing.assert_allclose(out_p.asnumpy(), out_e.asnumpy(), rtol=1e-13)


@gtx.field_operator
def hdiff_op(inp, coeff):
    lap_f = 4.0 * inp - (inp(Ioff[1]) + inp(Ioff[-1]) + inp(Joff[1]) + inp(Joff[-1]))
    res1 = lap_f(Ioff[1]) - lap_f
    flx = where(res1 * (inp(Ioff[1]) - inp) > 0.0, 0.0, res1)
    res2 = lap_f(Joff[1]) - lap_f
    fly = where(res2 * (inp(Joff[1]) - inp) > 0.0, 0.0, res2)
    return inp - coeff * (flx - flx(Ioff[-1]) + fly - fly(Joff[-1]))


def test_bridge_hdiff_matches_embedded(rng):
    n = 16
    data = rng.random((n, n, 3))
    co = rng.random((n, n, 3))
    inp = gtx.as_field([IDim, JDim, KDim], data)
    coeff = gtx.as_field([IDim, JDim, KDim], co)
    dom = {IDim: (2, n - 2), JDim: (2, n - 2), KDim: 3}

    out_e = gtx.zeros(dom)
    hdiff_op.with_backend(None)(inp, coeff, out=out_e, offset_provider=PROV)

    op = hdiff_op.with_backend("tpu:pallas")
    out_p = gtx.zeros(dom)
    op(inp, coeff, out=out_p, offset_provider=PROV)
    assert all(v is not None for v in op._bridge_cache.values())
    np.testing.assert_allclose(out_p.asnumpy(), out_e.asnumpy(), rtol=1e-12)


def test_bridge_scalar_params_and_math(rng):
    from gt4py_tpu.next.fbuiltins import sqrt

    @gtx.field_operator
    def damp(a, b, alpha: float):
        return sqrt(abs(a)) * alpha + where(b > 0.5, a, -a)

    n = 10
    a = gtx.as_field([IDim, JDim], rng.random((n, n)))
    b = gtx.as_field([IDim, JDim], rng.random((n, n)))
    dom = {IDim: n, JDim: n}
    out_e = gtx.zeros(dom)
    damp.with_backend(None)(a, b, 1.5, out=out_e, offset_provider={})
    op = damp.with_backend("tpu:pallas")
    out_p = gtx.zeros(dom)
    op(a, b, 1.5, out=out_p, offset_provider={})
    assert all(v is not None for v in op._bridge_cache.values())
    np.testing.assert_allclose(out_p.asnumpy(), out_e.asnumpy(), rtol=1e-13)


def test_bridge_nested_operator_calls(rng):
    @gtx.field_operator
    def laplap(phi):
        return lap(lap(phi))

    n = 14
    data = rng.random((n, n))
    phi = gtx.as_field([IDim, JDim], data)
    dom = {IDim: (2, n - 2), JDim: (2, n - 2)}
    out_e = gtx.zeros(dom)
    laplap.with_backend(None)(phi, out=out_e, offset_provider=PROV)
    op = laplap.with_backend("tpu:pallas")
    out_p = gtx.zeros(dom)
    op(phi, out=out_p, offset_provider=PROV)
    assert all(v is not None for v in op._bridge_cache.values())
    np.testing.assert_allclose(out_p.asnumpy(), out_e.asnumpy(), rtol=1e-12)


def test_unstructured_falls_back_to_embedded(rng):
    """Connectivity offsets are outside the bridge: the embedded path must
    serve them (and still be correct)."""
    from tests.next_tests.test_field_ops import make_periodic_mesh

    V = Dimension("Vertex")
    E = Dimension("Edge")
    V2EDim = Dimension("V2E", kind=DimensionKind.LOCAL)
    E2VDim = Dimension("E2V", kind=DimensionKind.LOCAL)
    V2E = FieldOffset("V2E", source=E, target=(V, V2EDim))
    E2V = FieldOffset("E2V", source=V, target=(E, E2VDim))

    @gtx.field_operator
    def nabla(pp, s_x, sign, vol):
        zavg = 0.5 * (pp(E2V[0]) + pp(E2V[1])) * s_x
        return neighbor_sum(zavg(V2E) * sign, axis=V2EDim) / vol

    n = 4
    e2v_np, v2e_np, signs_np = make_periodic_mesh(n)
    nv, ne = n * n, 2 * n * n
    pp = gtx.as_field([V], rng.random(nv))
    s_x = gtx.as_field([E], rng.random(ne))
    sign = gtx.as_field([V, V2EDim], signs_np)
    vol = gtx.as_field([V], rng.random(nv) + 0.5)
    e2v = gtx.as_connectivity([E, E2VDim], V, e2v_np)
    v2e = gtx.as_connectivity([V, V2EDim], E, v2e_np)
    out = gtx.zeros({V: nv})
    nabla.with_backend("tpu:pallas")(
        pp, s_x, sign, vol, out=out, offset_provider={"E2V": e2v, "V2E": v2e}
    )
    zavg = 0.5 * (pp.asnumpy()[e2v_np[:, 0]] + pp.asnumpy()[e2v_np[:, 1]]) * s_x.asnumpy()
    expected = (zavg[v2e_np] * signs_np).sum(axis=1) / vol.asnumpy()
    np.testing.assert_allclose(out.asnumpy(), expected, rtol=1e-12)
