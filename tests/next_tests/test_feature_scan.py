"""Scan-operator feature matrix additions (ported behaviors from
/root/reference/tests/next_tests/integration_tests/feature_tests/
ffront_tests/test_scan.py not yet in test_scan_features.py: scans
calling field operators per level, the canonical two-scan tridiagonal
solve inside a field operator, tuple args with mismatched domains,
decoration-time carry/init/return type errors)."""

from functools import reduce

import numpy as np
import pytest

import gt4py_tpu.next as gtx

from . import cases
from .cases import (
    IDim,
    IJKField,
    JDim,
    KDim,
    cartesian_case,  # noqa: F401 (fixture)
)


@pytest.mark.parametrize("forward", [True, False])
def test_fieldop_from_scan(cartesian_case, forward):
    init = 1.0
    k_size = cartesian_case.default_sizes[KDim]
    expected = np.arange(init + 1.0, init + 1.0 + k_size, 1)
    if not forward:
        expected = np.flip(expected)

    @gtx.field_operator
    def add(carry: float, foo: float) -> float:
        return carry + foo

    @gtx.scan_operator(axis=KDim, forward=forward, init=init)
    def simple_scan_operator(carry: float) -> float:
        return add(carry, 1.0)

    out = gtx.zeros({KDim: k_size})
    cases.verify(cartesian_case, simple_scan_operator, out=out, ref=expected)


def test_solve_triag(cartesian_case):
    @gtx.scan_operator(axis=KDim, forward=True, init=(0.0, 0.0))
    def tridiag_forward(
        state: tuple[float, float], a: float, b: float, c: float, d: float
    ) -> tuple[float, float]:
        return (c / (b - a * state[0]), (d - a * state[1]) / (b - a * state[0]))

    @gtx.scan_operator(axis=KDim, forward=False, init=0.0)
    def tridiag_backward(x_kp1: float, cp: float, dp: float) -> float:
        return dp - cp * x_kp1

    @gtx.field_operator
    def solve_tridiag(
        a: IJKField, b: IJKField, c: IJKField, d: IJKField
    ) -> IJKField:
        cp, dp = tridiag_forward(a, b, c, d)
        return tridiag_backward(cp, dp)

    shape = tuple(
        cartesian_case.default_sizes[dim] for dim in (IDim, JDim, KDim)
    )
    rng = np.random.default_rng(31)
    a = rng.random(shape)
    b = rng.random(shape) + 4.0  # diagonally dominant
    c = rng.random(shape)
    d = rng.random(shape)

    matrices = np.zeros(shape + shape[-1:])
    i = np.arange(shape[2])
    matrices[:, :, i[1:], i[:-1]] = a[:, :, 1:]
    matrices[:, :, i, i] = b
    matrices[:, :, i[:-1], i[1:]] = c[:, :, :-1]
    expected = np.linalg.solve(matrices, d[..., None])[..., 0]

    out = gtx.zeros({IDim: shape[0], JDim: shape[1], KDim: shape[2]})
    cases.verify(
        cartesian_case,
        solve_tridiag,
        gtx.as_field([IDim, JDim, KDim], a),
        gtx.as_field([IDim, JDim, KDim], b),
        gtx.as_field([IDim, JDim, KDim], c),
        gtx.as_field([IDim, JDim, KDim], d),
        out=out,
        ref=expected,
    )


def test_scan_different_domain_in_tuple(cartesian_case):
    init = 1.0
    i_size = cartesian_case.default_sizes[IDim]
    k_size = cartesian_case.default_sizes[KDim]

    inp1_np = np.ones((i_size + 1, k_size))  # one extra I row
    inp2_np = np.fromfunction(lambda i, k: k, shape=(i_size, k_size), dtype=float)
    inp1 = gtx.as_field([IDim, KDim], inp1_np)
    inp2 = gtx.as_field([IDim, KDim], inp2_np)
    out = gtx.zeros({IDim: i_size, KDim: k_size})

    expected = np.asarray(
        [
            reduce(
                lambda prev, k: prev + inp1_np[:-1, k] + inp2_np[:, k],
                range(k + 1),
                init,
            )
            for k in range(k_size)
        ]
    ).transpose()

    @gtx.scan_operator(axis=KDim, forward=True, init=init)
    def scan_op(carry: float, a: tuple[float, float]) -> float:
        return carry + a[0] + a[1]

    @gtx.field_operator
    def foo(
        inp1: gtx.Field[gtx.Dims[IDim, KDim], np.float64],
        inp2: gtx.Field[gtx.Dims[IDim, KDim], np.float64],
    ) -> gtx.Field[gtx.Dims[IDim, KDim], np.float64]:
        return scan_op((inp1, inp2))

    cases.verify(cartesian_case, foo, inp1, inp2, out=out, ref=expected)


def test_scan_wrong_return_type():
    with pytest.raises(gtx.DSLTypeError, match="same type as its return"):

        @gtx.scan_operator(axis=KDim, forward=True, init=0)
        def testee_scan(state: np.int32) -> float:
            return 1.0


def test_scan_wrong_init_type():
    with pytest.raises(
        gtx.DSLTypeError, match="'init'.*must have same type"
    ):

        @gtx.scan_operator(axis=KDim, forward=True, init=0)
        def testee_scan(state: float) -> float:
            return 1.0


def test_scan_without_carry():
    with pytest.raises(
        gtx.DSLTypeError, match="at least one argument"
    ):

        @gtx.scan_operator(axis=KDim, forward=True, init=0.0)
        def testee_scan() -> float:
            return 1.0
