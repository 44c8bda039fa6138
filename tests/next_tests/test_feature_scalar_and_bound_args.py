"""Scalar arguments, bound arguments, and constant closure vars
(ported behaviors from /root/reference/tests/next_tests/
integration_tests/feature_tests/ffront_tests/test_scalar_args.py,
test_bound_args.py, test_closure_vars.py)."""

import enum

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import broadcast
from gt4py_tpu.eve.utils import FrozenNamespace

from . import cases
from .cases import (
    IDim,
    IField,
    IJKField,
    Vertex,
    cartesian_case,  # noqa: F401 (fixture)
    unstructured_case,  # noqa: F401 (fixture)
)


# --- scalar args --------------------------------------------------------------


def test_scalar_arg_broadcast(unstructured_case):
    @gtx.field_operator
    def testee(a: np.int64):
        return broadcast(a + 1, (Vertex,))

    nv = unstructured_case.default_sizes[Vertex]
    out = gtx.zeros({Vertex: nv}, dtype=np.int64)
    cases.verify(
        unstructured_case, testee, np.int64(41), out=out,
        ref=np.full(nv, 42, dtype=np.int64),
    )


def test_np_bool_scalar_arg(unstructured_case):
    @gtx.field_operator
    def testee(a: bool):
        return broadcast(not a, (Vertex,))

    nv = unstructured_case.default_sizes[Vertex]
    out = gtx.zeros({Vertex: nv}, dtype=bool)
    cases.verify(
        unstructured_case, testee, np.bool_(True), out=out,
        ref=np.full(nv, False),
    )


def test_nested_scalar_arg(unstructured_case):
    @gtx.field_operator
    def testee_inner(a: np.int64):
        return broadcast(a + 1, (Vertex,))

    @gtx.field_operator
    def testee(a: np.int64):
        return testee_inner(a + 1)

    nv = unstructured_case.default_sizes[Vertex]
    out = gtx.zeros({Vertex: nv}, dtype=np.int64)
    cases.verify(
        unstructured_case, testee, np.int64(40), out=out,
        ref=np.full(nv, 42, dtype=np.int64),
    )


def test_scalar_arg_with_field_and_shift(cartesian_case):
    @gtx.field_operator
    def testee(a: IJKField, b: np.float64) -> IJKField:
        tmp = b * a
        return tmp(IDim + 1)

    a = cases.allocate(cartesian_case, testee, "a").extend({IDim: (0, 1)}).unique()()
    b = np.float64(3.0)
    out = cases.allocate(cartesian_case, testee, cases.RETURN)()
    cases.verify(
        cartesian_case, testee, a, b, out=out, ref=a.asnumpy()[1:] * b
    )


def test_double_use_scalar(cartesian_case):
    @gtx.field_operator
    def testee(a: np.float64, b: np.float64, c: IField) -> IField:
        tmp = a * b
        tmp2 = tmp * tmp
        # the intermediate is used twice so it cannot be trivially inlined
        return tmp2 * tmp2 * c

    cases.verify_with_default_data(
        cartesian_case, testee,
        ref=lambda a, b, c: (a * b) ** 4 * c,
    )


# --- bound args ----------------------------------------------------------------


def test_with_bound_args(cartesian_case):
    @gtx.field_operator
    def fieldop_bound_args(a: IField, scalar: np.float64, condition: bool) -> IField:
        if not condition:
            scalar = 0.0
        return a + scalar

    @gtx.program
    def program_bound_args(a, scalar, condition, out):
        fieldop_bound_args(a, scalar, condition, out=out)

    a = cases.allocate(cartesian_case, fieldop_bound_args, "a").unique()()
    out = cases.allocate(cartesian_case, fieldop_bound_args, cases.RETURN)()
    prog_bounds = program_bound_args.with_bound_args(
        scalar=np.float64(1.0), condition=True
    )
    # bound args arrive as kwargs; remaining params pass positionally
    prog_bounds.with_backend(cartesian_case.backend)(a, out=out, offset_provider={})
    np.testing.assert_allclose(out.asnumpy(), a.asnumpy() + 1.0)


def test_with_bound_args_order(cartesian_case):
    @gtx.field_operator
    def fieldop_args(a: IField, condition: bool, scalar: np.float64) -> IField:
        scalar = 0.0 if not condition else scalar
        return a + scalar

    @gtx.program
    def program_args(a, condition, scalar, out):
        fieldop_args(a, condition, scalar, out=out)

    a = cases.allocate(cartesian_case, fieldop_args, "a").unique()()
    out = cases.allocate(cartesian_case, fieldop_args, cases.RETURN)()
    prog_bounds = program_args.with_bound_args(condition=True)
    prog_bounds.with_backend(cartesian_case.backend)(
        a=a, scalar=np.float64(1.0), out=out, offset_provider={}
    )
    np.testing.assert_allclose(out.asnumpy(), a.asnumpy() + 1.0)


@pytest.fixture
def bound_args_testee():
    @gtx.field_operator
    def fieldop_zero():
        return broadcast(0.0, (IDim,))

    @gtx.program
    def program_bound_args(arg1, arg2, out):
        fieldop_zero(out=out)

    return program_bound_args


def test_bind_invalid_arg(bound_args_testee):
    with pytest.raises(TypeError, match="not a valid program parameter"):
        bound_args_testee.with_bound_args(inexistent_arg=1)


def test_call_bound_program_with_already_bound_arg(cartesian_case, bound_args_testee):
    program_with_bound_arg = bound_args_testee.with_bound_args(arg2=True)
    out = gtx.zeros({IDim: cartesian_case.default_sizes[IDim]})
    with pytest.raises(TypeError, match="already bound"):
        program_with_bound_arg.with_backend(cartesian_case.backend)(
            True, out=out, arg2=True, offset_provider={}
        )


# --- constant closure vars ------------------------------------------------------


def test_constant_closure_vars_with_frozen_namespace(cartesian_case):
    constants = FrozenNamespace(PI=np.float64(3.142), E=np.float64(2.718))

    @gtx.field_operator
    def consume_constants(inp: IField) -> IField:
        return constants.PI * constants.E * inp

    cases.verify_with_default_data(
        cartesian_case, consume_constants, ref=lambda inp: 3.142 * 2.718 * inp
    )


def test_constant_closure_vars_with_enums(cartesian_case):
    class Constants(np.float64, enum.Enum):
        PI = 3.142
        E = 2.718

    @gtx.field_operator
    def consume_constants(inp: IField) -> IField:
        return Constants.PI * Constants.E * inp

    cases.verify_with_default_data(
        cartesian_case, consume_constants, ref=lambda inp: 3.142 * 2.718 * inp
    )
