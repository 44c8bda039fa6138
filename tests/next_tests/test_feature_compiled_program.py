"""AOT-compile / compiled-program-pool feature matrix (ported behaviors
from /root/reference/tests/next_tests/integration_tests/feature_tests/
ffront_tests/test_compiled_program.py not yet covered by test_infra /
test_otf_runners: compile with kwargs, compile for several offset
providers, scan compile, compiled pools respecting static-param
variants at call time, direct scan-operator calls)."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import neighbor_sum

from . import cases
from .cases import (
    Edge,
    EField,
    IDim,
    IField,
    KDim,
    TOY_V2E_TABLE,
    V2E,
    V2EDim,
    VField,
    Vertex,
    simple_unstructured_case,
)


def test_compile_then_call_uses_pool():
    @gtx.field_operator
    def testee(a: IField, b: IField) -> IField:
        return a + b

    case = cases.simple_cartesian_case("jax")
    a = cases.allocate(case, testee, "a").unique()()
    b = cases.allocate(case, testee, "b").unique()()
    out = cases.allocate(case, testee, cases.RETURN)()
    op = testee.compile(a, b, out=out, offset_provider={})
    n_before = len(op._pool)
    assert n_before >= 1
    cases.verify(case, op, a, b, out=out, ref=a.asnumpy() + b.asnumpy())
    assert len(op._pool) == n_before  # the call hit the precompiled entry


def test_compile_kwargs():
    @gtx.field_operator
    def testee(a: IField, factor: np.float64) -> IField:
        return a * factor

    case = cases.simple_cartesian_case("jax")
    a = cases.allocate(case, testee, "a").unique()()
    out = cases.allocate(case, testee, cases.RETURN)()
    op = testee.compile(a, factor=np.float64(2.0), out=out, offset_provider={})
    cases.verify(
        case, op, a, np.float64(2.0), out=out, ref=a.asnumpy() * 2.0
    )


def test_compile_scan():
    @gtx.scan_operator(axis=KDim, forward=True, init=0.0, backend="jax")
    def cumsum(state: float, a: float) -> float:
        return state + a

    nk = 10
    a = gtx.as_field([KDim], np.arange(nk, dtype=np.float64))
    out = gtx.zeros({KDim: nk})
    cumsum(a, out=out, offset_provider={})
    np.testing.assert_allclose(out.asnumpy(), np.cumsum(np.arange(nk)))


def test_compile_for_two_offset_providers():
    """The pool keys on offset-provider content: two meshes yield two
    variants, each numerically correct (reference
    test_compile_unstructured_for_two_offset_providers)."""

    @gtx.field_operator
    def testee(inp: EField) -> VField:
        return neighbor_sum(inp(V2E), axis=V2EDim)

    case = cases.simple_unstructured_case("jax")
    ne = case.default_sizes[Edge]
    nv = case.default_sizes[Vertex]
    # second mesh: reversed neighbor order (same shape, different content)
    v2e_b = TOY_V2E_TABLE[:, ::-1].copy()
    prov_b = {
        "V2E": gtx.as_connectivity([Vertex, V2EDim], Edge, v2e_b),
        "E2V": case.offset_provider["E2V"],
    }
    rng = np.random.default_rng(41)
    inp = gtx.as_field([Edge], rng.random(ne))
    out_a = gtx.zeros({Vertex: nv})
    out_b = gtx.zeros({Vertex: nv})
    testee(inp, out=out_a, offset_provider=case.offset_provider)
    testee(inp, out=out_b, offset_provider=prov_b)
    ref = np.sum(inp.asnumpy()[TOY_V2E_TABLE], axis=1)
    np.testing.assert_allclose(out_a.asnumpy(), ref)
    np.testing.assert_allclose(out_b.asnumpy(), ref)  # same sum, any order
    assert len(testee._pool) >= 2


def test_wrong_offset_provider_errors():
    @gtx.field_operator
    def testee(inp: EField) -> VField:
        return neighbor_sum(inp(V2E), axis=V2EDim)

    case = cases.simple_unstructured_case("jax")
    inp = gtx.as_field(
        [Edge], np.ones(case.default_sizes[Edge])
    )
    out = gtx.zeros({Vertex: case.default_sizes[Vertex]})
    with pytest.raises(Exception, match="(?i)v2e|offset|provider"):
        testee(inp, out=out, offset_provider={"WRONG_NAME": case.offset_provider["E2V"]})


def test_static_param_variants_compile_list():
    """compile(static=..., with list values) enumerates the cross
    product of variants (reference test_compile_variants)."""

    @gtx.field_operator
    def testee(a: IField, mode: np.int64) -> IField:
        return a + 1.0 if mode == 1 else a - 1.0

    op = testee.with_compilation_options(static_params=("mode",))
    case = cases.simple_cartesian_case("jax")
    a = cases.allocate(case, testee, "a").unique()()
    out = cases.allocate(case, testee, cases.RETURN)()
    op = op.compile(a, mode=[np.int64(1), np.int64(2)], out=out, offset_provider={})
    assert len(op._pool) >= 2
    cases.verify(
        case, op, a, np.int64(1), out=out, ref=a.asnumpy() + 1.0
    )
    cases.verify(
        case, op, a, np.int64(2), out=out, ref=a.asnumpy() - 1.0
    )


def test_direct_scan_operator_call_embedded():
    """Direct scan-operator calls without a backend run the reference
    (slow) per-level semantics (reference
    test_warn_on_direct_scan_operator_call — here the embedded path is
    supported, not warned)."""

    @gtx.scan_operator(axis=KDim, forward=True, init=0.0, backend=None)
    def cumsum(state: float, a: float) -> float:
        return state + a

    nk = 7
    a = gtx.as_field([KDim], np.arange(nk, dtype=np.float64))
    out = gtx.zeros({KDim: nk})
    cumsum(a, out=out, offset_provider={})
    np.testing.assert_allclose(out.asnumpy(), np.cumsum(np.arange(nk)))
