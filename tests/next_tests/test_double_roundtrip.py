"""Double-roundtrip execution: operators run through
pretty -> parse -> codegen -> exec and must match the direct execution
numerically (reference
/root/reference/src/gt4py/next/program_processors/runners/
double_roundtrip.py: the roundtrip backend routed through the
pretty-printed text validates printer+parser end-to-end, not just IR
equality)."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import foast, foast_pretty, neighbor_sum, where

from . import cases
from .cases import (
    E2V,
    EField,
    IDim,
    IField,
    Ioff,
    V2E,
    V2EDim,
    VField,
    Vertex,
)


def _roundtrip_exec(op, *args, provider):
    """Execute ``op`` directly AND through its textual round-trip; both
    results as numpy arrays."""
    definition = op.definition
    ir = foast.func_to_foast(definition)
    text = foast_pretty.pretty(ir)
    back = foast_pretty.parse(text)
    src = foast.codegen(back)
    from gt4py_tpu.next.foast import _function_from_source

    fn2 = _function_from_source(
        src, back.name, definition, None
    )
    from gt4py_tpu.next.embedded import offset_provider_context

    with offset_provider_context(provider):
        direct = definition(*args)
        via_text = fn2(*args)
    return direct.asnumpy(), via_text.asnumpy()


@gtx.field_operator
def lap_op(f: IField) -> IField:
    return (f(Ioff[1]) + f(Ioff[-1])) - 2.0 * f


@gtx.field_operator
def vsum_op(ef: EField) -> VField:
    s = neighbor_sum(ef(V2E), axis=V2EDim)
    return s * 0.5


@gtx.field_operator
def mixed_op(a: IField, b: IField) -> IField:
    m = where(a > b, a, b)
    t = (m, a + b)
    return t[0] * 2.0 - t[1]


def test_double_roundtrip_cartesian():
    case = cases.simple_cartesian_case(None)
    n = case.default_sizes[IDim]
    rng = np.random.default_rng(51)
    f = gtx.as_field([IDim], rng.random(n + 2))
    direct, via_text = _roundtrip_exec(
        lap_op, f, provider=case.offset_provider
    )
    np.testing.assert_allclose(direct, via_text)


def test_double_roundtrip_unstructured():
    case = cases.simple_unstructured_case(None)
    rng = np.random.default_rng(52)
    ef = gtx.as_field(
        [cases.Edge], rng.random(case.default_sizes[cases.Edge])
    )
    direct, via_text = _roundtrip_exec(
        vsum_op, ef, provider=case.offset_provider
    )
    np.testing.assert_allclose(direct, via_text)


def test_double_roundtrip_mixed_constructs():
    case = cases.simple_cartesian_case(None)
    n = case.default_sizes[IDim]
    rng = np.random.default_rng(53)
    a = gtx.as_field([IDim], rng.random(n))
    b = gtx.as_field([IDim], rng.random(n))
    direct, via_text = _roundtrip_exec(
        mixed_op, a, b, provider=case.offset_provider
    )
    np.testing.assert_allclose(direct, via_text)


def test_double_roundtrip_matches_backend_execution():
    """The text-path result equals the full backend (jit) execution."""
    case = cases.simple_cartesian_case("jax")
    n = case.default_sizes[IDim]
    rng = np.random.default_rng(54)
    a = gtx.as_field([IDim], rng.random(n))
    b = gtx.as_field([IDim], rng.random(n))
    out = gtx.zeros({IDim: n})
    cases.run(case, mixed_op, a, b, out=out)
    _, via_text = _roundtrip_exec(mixed_op, a, b, provider={})
    np.testing.assert_allclose(out.asnumpy(), via_text)
