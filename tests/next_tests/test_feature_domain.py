"""Program `domain=` feature matrix (ported behaviors from
/root/reference/tests/next_tests/integration_tests/feature_tests/
ffront_tests/test_domain.py: scalar-driven domain bounds, arithmetic in
bounds, sliced out-arguments, per-output tuple domains)."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import broadcast, minimum

from . import cases
from .cases import (
    IDim,
    IField,
    IJField,
    IKField,
    JDim,
    KDim,
    cartesian_case,  # noqa: F401 (fixture)
)


def test_scalar_in_domain_spec_and_fo_call(cartesian_case):
    @gtx.field_operator
    def testee_op(size: np.int64):
        return broadcast(size, (IDim,))

    @gtx.program
    def testee(size, out):
        testee_op(size, out=out, domain={IDim: (0, size)})

    size = cartesian_case.default_sizes[IDim]
    out = gtx.zeros({IDim: size}, dtype=np.int64)
    cases.verify(
        cartesian_case, testee, np.int64(size), out,
        inout=out, ref=np.full(size, size, dtype=np.int64),
    )


def test_single_value_field_sliced_out(cartesian_case):
    @gtx.field_operator
    def testee_fo(a: IKField) -> IKField:
        return a

    @gtx.program
    def testee_prog(a):
        testee_fo(a, out=a[1:2, 3:4])

    a = cases.allocate(cartesian_case, testee_prog.definition if False else testee_fo, "a").unique()()
    ref = a.asnumpy().copy()  # writing a's own value back: a no-op overall
    cases.run(cartesian_case, testee_prog, a)
    np.testing.assert_allclose(a.asnumpy(), ref)


def test_domain_with_min_builtin(cartesian_case):
    @gtx.field_operator
    def fieldop_domain(a: IField) -> IField:
        return a + a

    @gtx.program
    def program_domain(a, size, out):
        fieldop_domain(a, out=out, domain={IDim: (minimum(1, 2), size)})

    a = cases.allocate(cartesian_case, fieldop_domain, "a").unique()()
    size = cartesian_case.default_sizes[IDim]
    out = gtx.zeros({IDim: size})
    ref = out.asnumpy().copy()
    ref[1:size] = a.asnumpy()[1:size] * 2
    cases.verify(
        cartesian_case, program_domain, a, np.int64(size), out, inout=out, ref=ref
    )


def test_domain_input_bounds_arithmetic(cartesian_case):
    lower_i = 1
    upper_i = cartesian_case.default_sizes[IDim] + 1

    @gtx.field_operator
    def fieldop_domain(a: IField) -> IField:
        return a + a

    @gtx.program
    def program_domain(inp, out, lower_i, upper_i):
        fieldop_domain(inp, out=out, domain={IDim: (lower_i, upper_i // 2)})

    inp = cases.allocate(cartesian_case, fieldop_domain, "a").unique()()
    size = cartesian_case.default_sizes[IDim]
    out = gtx.zeros({IDim: size})
    ref = out.asnumpy().copy()
    ref[lower_i : upper_i // 2] = inp.asnumpy()[lower_i : upper_i // 2] * 2
    cases.verify(
        cartesian_case, program_domain, inp, out,
        np.int64(lower_i), np.int64(upper_i),
        inout=out, ref=ref,
    )


def test_domain_input_bounds_2d_mixed_arithmetic(cartesian_case):
    ni = cartesian_case.default_sizes[IDim]
    nj = cartesian_case.default_sizes[JDim]
    lower_i, upper_i = 1, ni
    lower_j, upper_j = nj - 3, nj - 1

    @gtx.field_operator
    def fieldop_domain(a: IJField) -> IJField:
        return a + a

    @gtx.program
    def program_domain(a, out, lower_i, upper_i, lower_j, upper_j):
        fieldop_domain(
            a,
            out=out,
            domain={IDim: (1 * lower_i, upper_i + 0), JDim: (lower_j - 0, upper_j)},
        )

    a = cases.allocate(cartesian_case, fieldop_domain, "a").unique()()
    out = gtx.zeros({IDim: ni, JDim: nj})
    ref = out.asnumpy().copy()
    ref[lower_i:upper_i, lower_j:upper_j] = a.asnumpy()[lower_i:upper_i, lower_j:upper_j] * 2
    cases.verify(
        cartesian_case, program_domain, a, out,
        np.int64(lower_i), np.int64(upper_i), np.int64(lower_j), np.int64(upper_j),
        inout=out, ref=ref,
    )


def test_domain_tuple_outputs(cartesian_case):
    @gtx.field_operator
    def fieldop_domain_tuple(a: IJField, b: IJField) -> tuple[IJField, IJField]:
        return (a + b, b)

    @gtx.program
    def program_domain_tuple(inp0, inp1, out0, out1, isize, jsize):
        fieldop_domain_tuple(
            inp0, inp1, out=(out0, out1),
            domain={IDim: (1, isize), JDim: (jsize - 2, jsize)},
        )

    ni = cartesian_case.default_sizes[IDim]
    nj = cartesian_case.default_sizes[JDim]
    inp0 = cases.allocate(cartesian_case, fieldop_domain_tuple, "a").unique()()
    inp1 = cases.allocate(cartesian_case, fieldop_domain_tuple, "b").unique()()
    out0 = gtx.zeros({IDim: ni, JDim: nj})
    out1 = gtx.zeros({IDim: ni, JDim: nj})
    isize, jsize = ni, nj - 1
    ref0 = out0.asnumpy().copy()
    ref0[1:isize, jsize - 2 : jsize] = (
        inp0.asnumpy()[1:isize, jsize - 2 : jsize]
        + inp1.asnumpy()[1:isize, jsize - 2 : jsize]
    )
    ref1 = out1.asnumpy().copy()
    ref1[1:isize, jsize - 2 : jsize] = inp1.asnumpy()[1:isize, jsize - 2 : jsize]
    cases.verify(
        cartesian_case, program_domain_tuple, inp0, inp1, out0, out1,
        np.int64(isize), np.int64(jsize),
        inout=(out0, out1), ref=(ref0, ref1),
    )
