"""Per-output domains for tuple outputs (ported behaviors from
/root/reference/tests/next_tests/integration_tests/multi_feature_tests/
ffront_tests/test_multiple_output_domains.py: a tuple `domain=`
distributes over the output tuple — different dims and bounds per
output — plus sliced tuple out-args and out-as-tuple-parameter)."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx

from . import cases
from .cases import (
    IDim,
    IField,
    JDim,
    cartesian_case,  # noqa: F401 (fixture)
)

JField = gtx.Field[gtx.Dims[JDim], np.float64]


@gtx.field_operator
def fop_original(a: IField, b: IField) -> tuple[IField, IField]:
    return b, a


@gtx.field_operator
def fop_different_fields(a: IField, b: JField) -> tuple[JField, IField]:
    return b, a


def test_program_single_shared_domain(cartesian_case):
    @gtx.program
    def prog_orig(a, b, out_a, out_b, i_size):
        fop_original(a, b, out=(out_b, out_a), domain={IDim: (0, i_size)})

    n = cartesian_case.default_sizes[IDim]
    a = cases.allocate(cartesian_case, fop_original, "a").unique()()
    b = cases.allocate(cartesian_case, fop_original, "b").unique()()
    out_a = gtx.zeros({IDim: n})
    out_b = gtx.zeros({IDim: n})
    cases.verify(
        cartesian_case, prog_orig, a, b, out_a, out_b, np.int64(n),
        inout=(out_b, out_a), ref=(b, a),
    )


def test_program_per_output_domains(cartesian_case):
    @gtx.program
    def prog(a, b, out_a, out_b, i_size, j_size):
        fop_different_fields(
            a, b, out=(out_b, out_a),
            domain=({JDim: (0, j_size)}, {IDim: (0, i_size)}),
        )

    ni = cartesian_case.default_sizes[IDim]
    nj = cartesian_case.default_sizes[JDim]
    rng = np.random.default_rng(61)
    a = gtx.as_field([IDim], rng.random(ni))
    b = gtx.as_field([JDim], rng.random(nj))
    out_a = gtx.zeros({IDim: ni})
    out_b = gtx.zeros({JDim: nj})
    cases.verify(
        cartesian_case, prog, a, b, out_a, out_b,
        np.int64(ni), np.int64(nj),
        inout=(out_b, out_a), ref=(b, a),
    )


def test_operator_call_per_output_domains(cartesian_case):
    ni = cartesian_case.default_sizes[IDim]
    nj = cartesian_case.default_sizes[JDim]
    rng = np.random.default_rng(62)
    a = gtx.as_field([IDim], rng.random(ni))
    b = gtx.as_field([JDim], rng.random(nj))
    out_a = gtx.zeros({IDim: ni})
    out_b = gtx.zeros({JDim: nj})
    fop_different_fields.with_backend(cartesian_case.backend)(
        a, b, out=(out_b, out_a),
        domain=({JDim: (0, nj - 2)}, {IDim: (1, ni)}),
        offset_provider={},
    )
    # partial writes: outside the per-output domains out keeps zeros
    np.testing.assert_allclose(out_b.asnumpy()[: nj - 2], b.asnumpy()[: nj - 2])
    assert np.all(out_b.asnumpy()[nj - 2 :] == 0.0)
    np.testing.assert_allclose(out_a.asnumpy()[1:], a.asnumpy()[1:])
    assert out_a.asnumpy()[0] == 0.0


def test_program_no_domain_different_fields(cartesian_case):
    @gtx.program
    def prog_no_domain(a, b, out_a, out_b):
        fop_different_fields(a, b, out=(out_b, out_a))

    ni = cartesian_case.default_sizes[IDim]
    nj = cartesian_case.default_sizes[JDim]
    rng = np.random.default_rng(63)
    a = gtx.as_field([IDim], rng.random(ni))
    b = gtx.as_field([JDim], rng.random(nj))
    out_a = gtx.zeros({IDim: ni})
    out_b = gtx.zeros({JDim: nj})
    cases.verify(
        cartesian_case, prog_no_domain, a, b, out_a, out_b,
        inout=(out_b, out_a), ref=(b, a),
    )


def test_program_sliced_tuple_out(cartesian_case):
    @gtx.program
    def prog_slicing(a, b, out_a, out_b):
        fop_different_fields(a, b, out=(out_b[2:-2], out_a[1:-1]))

    ni = cartesian_case.default_sizes[IDim]
    nj = cartesian_case.default_sizes[JDim]
    rng = np.random.default_rng(64)
    a = gtx.as_field([IDim], rng.random(ni))
    b = gtx.as_field([JDim], rng.random(nj))
    out_a = gtx.zeros({IDim: ni})
    out_b = gtx.zeros({JDim: nj})
    cases.run(cartesian_case, prog_slicing, a, b, out_a, out_b)
    np.testing.assert_allclose(out_b.asnumpy()[2:-2], b.asnumpy()[2:-2])
    assert np.all(out_b.asnumpy()[:2] == 0.0) and np.all(out_b.asnumpy()[-2:] == 0.0)
    np.testing.assert_allclose(out_a.asnumpy()[1:-1], a.asnumpy()[1:-1])
    assert out_a.asnumpy()[0] == 0.0 and out_a.asnumpy()[-1] == 0.0
