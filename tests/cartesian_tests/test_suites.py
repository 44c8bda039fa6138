"""Hypothesis-driven stencil suites across all registered backends
(reference pattern: tests/cartesian_tests/integration_tests/
multi_feature_tests/test_suites.py + testing/suites.py)."""

import numpy as np

from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.testing import StencilTestSuite, field, parameter


class TestCopy(StencilTestSuite):
    dtypes = [np.float64, np.float32]
    domain_range = [(1, 12), (1, 12), (1, 8)]
    symbols = dict(field_a=field(in_range=(-10, 10)), field_b=field(in_range=(-10, 10)))
    max_examples = 3

    def definition(field_a, field_b):
        with gtscript.computation("PARALLEL"), gtscript.interval(...):
            field_b = field_a[0, 0, 0]

    def validation(field_a, field_b, *, domain, origin):
        i0, j0, k0 = origin
        ni, nj, nk = domain
        field_b[i0 : i0 + ni, j0 : j0 + nj, k0 : k0 + nk] = field_a[
            i0 : i0 + ni, j0 : j0 + nj, k0 : k0 + nk
        ]


class TestShiftAndScale(StencilTestSuite):
    dtypes = [np.float64]
    domain_range = [(2, 10), (2, 10), (1, 6)]
    symbols = dict(
        inp=field(in_range=(-5, 5), boundary=((1, 1), (1, 1), (0, 0))),
        out=field(in_range=(-5, 5)),
        factor=parameter(in_range=(-2, 2)),
    )
    max_examples = 3

    def definition(inp, out, factor: float):
        with gtscript.computation("PARALLEL"), gtscript.interval(...):
            out = factor * (inp[1, 0, 0] + inp[-1, 0, 0] + inp[0, 1, 0] + inp[0, -1, 0])

    def validation(inp, out, factor, *, domain, origin):
        ni, nj, nk = domain
        # Each array carries its own halo: inp origin is (1, 1, 0), out (0, 0, 0).
        out[:ni, :nj, :nk] = factor * (
            inp[2 : 2 + ni, 1 : 1 + nj, :nk]
            + inp[0:ni, 1 : 1 + nj, :nk]
            + inp[1 : 1 + ni, 2 : 2 + nj, :nk]
            + inp[1 : 1 + ni, 0:nj, :nk]
        )


class TestForwardCumsum(StencilTestSuite):
    dtypes = [np.float64]
    domain_range = [(1, 6), (1, 6), (2, 8)]
    symbols = dict(inp=field(in_range=(-3, 3)), acc=field(in_range=(0, 0)))
    max_examples = 3

    def definition(inp, acc):
        with gtscript.computation("FORWARD"):
            with gtscript.interval(0, 1):
                acc = inp[0, 0, 0]
            with gtscript.interval(1, None):
                acc = acc[0, 0, -1] + inp[0, 0, 0]

    def validation(inp, acc, *, domain, origin):
        i0, j0, k0 = origin
        ni, nj, nk = domain
        acc[i0 : i0 + ni, j0 : j0 + nj, k0 : k0 + nk] = np.cumsum(
            inp[i0 : i0 + ni, j0 : j0 + nj, k0 : k0 + nk], axis=2
        )
