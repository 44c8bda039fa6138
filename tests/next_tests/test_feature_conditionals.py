"""Scalar-conditional feature matrix (ported behaviors from
/root/reference/tests/next_tests/integration_tests/feature_tests/
ffront_tests/test_conditionals.py: if-statements with partial
assignments, early returns from branches, nested ifs, if-without-else,
ternaries incl. broadcast literals and tuple branches, non-scalar /
non-boolean condition rejection)."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import broadcast

from . import cases
from .cases import (
    IDim,
    IField,
    cartesian_case,  # noqa: F401 (fixture)
)


@pytest.mark.parametrize("condition", [True, False])
def test_simple_if(condition, cartesian_case):
    @gtx.field_operator
    def simple_if(a: IField, b: IField, condition: bool) -> IField:
        if condition:
            result = a
        else:
            result = b
        return result

    a = cases.allocate(cartesian_case, simple_if, "a")()
    b = cases.allocate(cartesian_case, simple_if, "b")()
    out = cases.allocate(cartesian_case, simple_if, cases.RETURN)()
    cases.verify(
        cartesian_case, simple_if, a, b, condition, out=out,
        ref=a if condition else b,
    )


@pytest.mark.parametrize(
    "condition1, condition2", [(True, True), (True, False), (False, True), (False, False)]
)
def test_if_two_names_then_ternary(condition1, condition2, cartesian_case):
    @gtx.field_operator
    def simple_if(
        a: IField, b: IField, condition1: bool, condition2: bool
    ) -> IField:
        if condition1:
            result1 = a
            result2 = a + 1.0
        else:
            result1 = b
            result2 = b + 1.0
        return result1 if condition2 else result2

    a = cases.allocate(cartesian_case, simple_if, "a")()
    b = cases.allocate(cartesian_case, simple_if, "b")()
    out = cases.allocate(cartesian_case, simple_if, cases.RETURN)()
    base = a.asnumpy() if condition1 else b.asnumpy()
    cases.verify(
        cartesian_case, simple_if, a, b, condition1, condition2, out=out,
        ref=base + (0.0 if condition2 else 1.0),
    )


@pytest.mark.parametrize("condition", [True, False])
def test_branch_local_temporaries(cartesian_case, condition):
    @gtx.field_operator
    def temporary_if(a: IField, b: IField, condition: bool) -> IField:
        if condition:
            tmp1 = a
            result = tmp1
        else:
            tmp2 = b
            result = tmp2
        return result

    a = cases.allocate(cartesian_case, temporary_if, "a")()
    b = cases.allocate(cartesian_case, temporary_if, "b")()
    out = cases.allocate(cartesian_case, temporary_if, cases.RETURN)()
    cases.verify(
        cartesian_case, temporary_if, a, b, condition, out=out,
        ref=a if condition else b,
    )


@pytest.mark.parametrize("condition", [True, False])
def test_if_both_branches_return(cartesian_case, condition):
    @gtx.field_operator
    def both_return(a: IField, b: IField, condition: bool) -> IField:
        if condition:
            tmp1 = a
            return tmp1
        else:
            tmp2 = b
            return tmp2

    a = cases.allocate(cartesian_case, both_return, "a")()
    b = cases.allocate(cartesian_case, both_return, "b")()
    out = cases.allocate(cartesian_case, both_return, cases.RETURN)()
    cases.verify(
        cartesian_case, both_return, a, b, condition, out=out,
        ref=a if condition else b,
    )


@pytest.mark.parametrize("condition", [True, False])
def test_if_branch_returns_else_falls_through(cartesian_case, condition):
    @gtx.field_operator
    def if_branch_returns(a: IField, b: IField, condition: bool) -> IField:
        if condition:
            tmp1 = a
            return tmp1
        return b

    a = cases.allocate(cartesian_case, if_branch_returns, "a")()
    b = cases.allocate(cartesian_case, if_branch_returns, "b")()
    out = cases.allocate(cartesian_case, if_branch_returns, cases.RETURN)()
    cases.verify(
        cartesian_case, if_branch_returns, a, b, condition, out=out,
        ref=a if condition else b,
    )


@pytest.mark.parametrize("condition", [True, False])
def test_else_branch_returns_if_falls_through(cartesian_case, condition):
    @gtx.field_operator
    def else_branch_returns(a: IField, b: IField, condition: bool) -> IField:
        if condition:
            pass
        else:
            tmp1 = b
            return tmp1
        return a

    a = cases.allocate(cartesian_case, else_branch_returns, "a")()
    b = cases.allocate(cartesian_case, else_branch_returns, "b")()
    out = cases.allocate(cartesian_case, else_branch_returns, cases.RETURN)()
    cases.verify(
        cartesian_case, else_branch_returns, a, b, condition, out=out,
        ref=a if condition else b,
    )


@pytest.mark.parametrize(
    "condition1, condition2", [(True, True), (True, False), (False, True), (False, False)]
)
def test_nested_if_stmt_conditional_return(cartesian_case, condition1, condition2):
    @gtx.field_operator
    def nested(inp: IField, condition1: bool, condition2: bool) -> IField:
        if condition1:
            tmp1 = inp
            if condition2:
                return tmp1 + 1.0
            result = tmp1 + 2.0
        else:
            result = inp + 3.0
        return result

    inp = cases.allocate(cartesian_case, nested, "inp")()
    out = cases.allocate(cartesian_case, nested, cases.RETURN)()
    ref = {
        (True, True): inp.asnumpy() + 1.0,
        (True, False): inp.asnumpy() + 2.0,
        (False, True): inp.asnumpy() + 3.0,
        (False, False): inp.asnumpy() + 3.0,
    }
    cases.verify(
        cartesian_case, nested, inp, condition1, condition2, out=out,
        ref=ref[(condition1, condition2)],
    )


@pytest.mark.parametrize("condition", [True, False])
def test_nested_if_scalar_temporaries(cartesian_case, condition):
    @gtx.field_operator
    def nested_if(a: IField, b: IField, condition: bool) -> IField:
        if condition:
            if not condition:
                inner = a
            else:
                inner = a + 1.0
            result = inner
        else:
            result = b
            if condition:
                another_inner = 3.0
            else:
                another_inner = 5.0
            result = result + another_inner
        return result

    a = cases.allocate(cartesian_case, nested_if, "a")()
    b = cases.allocate(cartesian_case, nested_if, "b")()
    out = cases.allocate(cartesian_case, nested_if, cases.RETURN)()
    cases.verify(
        cartesian_case, nested_if, a, b, condition, out=out,
        ref=a.asnumpy() + 1.0 if condition else b.asnumpy() + 5.0,
    )


@pytest.mark.parametrize(
    "condition1, condition2", [(True, True), (True, False), (False, True), (False, False)]
)
def test_if_without_else(cartesian_case, condition1, condition2):
    @gtx.field_operator
    def if_without_else(
        a: IField, b: IField, condition1: bool, condition2: bool
    ) -> IField:
        result = b + 1.0
        if condition1:
            if not condition2:
                inner = a
            else:
                inner = a + 2.0
            result = inner
        return result

    a = cases.allocate(cartesian_case, if_without_else, "a")()
    b = cases.allocate(cartesian_case, if_without_else, "b")()
    out = cases.allocate(cartesian_case, if_without_else, cases.RETURN)()
    ref = {
        (True, True): a.asnumpy() + 2.0,
        (True, False): a.asnumpy(),
        (False, True): b.asnumpy() + 1.0,
        (False, False): b.asnumpy() + 1.0,
    }
    cases.verify(
        cartesian_case, if_without_else, a, b, condition1, condition2,
        out=out, ref=ref[(condition1, condition2)],
    )


def test_if_non_scalar_condition_rejected():
    """A field-valued `if` condition is rejected at decoration time
    (reference: "Condition for 'if' must be scalar" — use `where`)."""
    with pytest.raises(gtx.DSLTypeError, match="(?i)scalar"):

        @gtx.field_operator
        def if_non_scalar(a: IField, b: IField) -> IField:
            result = a
            if a == b:
                result = b
            return result


@pytest.mark.parametrize("left, right", [(2, 3), (3, 2)])
def test_ternary_operator(cartesian_case, left, right):
    @gtx.field_operator
    def testee(a: IField, b: IField, left: np.int64, right: np.int64) -> IField:
        return a if left < right else b

    a = cases.allocate(cartesian_case, testee, "a")()
    b = cases.allocate(cartesian_case, testee, "b")()
    out = cases.allocate(cartesian_case, testee, cases.RETURN)()
    cases.verify(
        cartesian_case, testee, a, b, np.int64(left), np.int64(right),
        out=out, ref=a if left < right else b,
    )


@pytest.mark.parametrize("left, right", [(2, 3), (3, 2)])
def test_ternary_operator_broadcast_literals(cartesian_case, left, right):
    @gtx.field_operator
    def testee(left: np.int64, right: np.int64):
        return (
            broadcast(3.0, (IDim,)) if left > right else broadcast(4.0, (IDim,))
        )

    n = cartesian_case.default_sizes[IDim]
    out = gtx.zeros({IDim: n})
    cases.verify(
        cartesian_case, testee, np.int64(left), np.int64(right), out=out,
        ref=np.full(n, 3.0) if left > right else np.full(n, 4.0),
    )


@pytest.mark.parametrize("left, right", [(2, 3), (3, 2)])
def test_ternary_operator_tuple(cartesian_case, left, right):
    @gtx.field_operator
    def testee(
        a: IField, b: IField, left: np.int64, right: np.int64
    ) -> tuple[IField, IField]:
        return (a, b) if left < right else (b, a)

    a = cases.allocate(cartesian_case, testee, "a")()
    b = cases.allocate(cartesian_case, testee, "b")()
    out = cases.allocate(cartesian_case, testee, cases.RETURN)()
    cases.verify(
        cartesian_case, testee, a, b, np.int64(left), np.int64(right),
        out=out, ref=(a, b) if left < right else (b, a),
    )
