"""Extended hypothesis-driven stencil suites: feature-interaction coverage.

Reference pattern: the StencilTestSuite grids in
/root/reference/tests/cartesian_tests/integration_tests/multi_feature_tests/
test_suites.py — each suite grinds (backend x dtype x random domain x
random data) against a hand-written NumPy oracle. These suites target the
interactions the basic suites (test_suites.py) do not: sequential scans
with multi-section intervals, flux-limiter ternaries over temporaries,
horizontal regions, while-loop iteration, field-condition if/else,
absolute-K reads, native math functions, and integer arithmetic.
"""

import numpy as np

from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.testing import StencilTestSuite, field, parameter


class TestBackwardCumsum(StencilTestSuite):
    dtypes = [np.float64]
    domain_range = [(1, 6), (1, 6), (2, 8)]
    symbols = dict(inp=field(in_range=(-3, 3)), acc=field(in_range=(0, 0)))
    max_examples = 10

    def definition(inp, acc):
        with gtscript.computation("BACKWARD"):
            with gtscript.interval(-1, None):
                acc = inp[0, 0, 0]
            with gtscript.interval(0, -1):
                acc = acc[0, 0, 1] + inp[0, 0, 0]

    def validation(inp, acc, *, domain, origin):
        i0, j0, k0 = origin
        ni, nj, nk = domain
        sub = inp[i0 : i0 + ni, j0 : j0 + nj, k0 : k0 + nk]
        acc[i0 : i0 + ni, j0 : j0 + nj, k0 : k0 + nk] = np.cumsum(
            sub[:, :, ::-1], axis=2
        )[:, :, ::-1]


class TestFluxLimiter(StencilTestSuite):
    """Temporaries + shifted temp reads + ternary select (hdiff's shape)."""

    dtypes = [np.float64, np.float32]
    domain_range = [(2, 10), (2, 10), (1, 4)]
    symbols = dict(
        inp=field(in_range=(-4, 4), boundary=((2, 2), (0, 0), (0, 0))),
        out=field(in_range=(0, 0)),
    )
    max_examples = 10

    def definition(inp, out):
        with gtscript.computation("PARALLEL"), gtscript.interval(...):
            grad = inp[1, 0, 0] - inp[0, 0, 0]
            flux = 0.0 if (grad * (inp[1, 0, 0] + inp[0, 0, 0])) > 0.0 else grad
            out = flux[0, 0, 0] - flux[-1, 0, 0]

    def validation(inp, out, *, domain, origin):
        ni, nj, nk = domain
        ext = inp[1 : ni + 4 - 1, :nj, :nk]  # rows [1, ni+3)
        grad = ext[1:, :, :] - ext[:-1, :, :]  # at rows [1, ni+2)
        cond = grad * (ext[1:, :, :] + ext[:-1, :, :]) > 0.0
        flux = np.where(cond, 0.0, grad)
        out[:ni, :nj, :nk] = flux[1:, :, :] - flux[:-1, :, :]


class TestHorizontalRegion(StencilTestSuite):
    dtypes = [np.float64]
    domain_range = [(3, 9), (3, 9), (1, 4)]
    symbols = dict(inp=field(in_range=(-5, 5)), out=field(in_range=(-5, 5)))
    max_examples = 10

    def definition(inp, out):
        with gtscript.computation("PARALLEL"), gtscript.interval(...):
            out = inp[0, 0, 0]
            with horizontal(region[I[0], :]):
                out = inp[0, 0, 0] * 10.0
            with horizontal(region[I[-1], J[0]]):
                out = -inp[0, 0, 0]

    def validation(inp, out, *, domain, origin):
        ni, nj, nk = domain
        out[:ni, :nj, :nk] = inp[:ni, :nj, :nk]
        out[0, :nj, :nk] = inp[0, :nj, :nk] * 10.0
        out[ni - 1, 0, :nk] = -inp[ni - 1, 0, :nk]


class TestWhileNewton(StencilTestSuite):
    """Per-point while-loop iteration (Newton sqrt, bounded by value)."""

    dtypes = [np.float64]
    domain_range = [(1, 6), (1, 6), (1, 4)]
    symbols = dict(a=field(in_range=(1.0, 16.0)), out=field(in_range=(0, 0)))
    max_examples = 10

    def definition(a, out):
        with gtscript.computation("PARALLEL"), gtscript.interval(...):
            x = a[0, 0, 0]
            while x * x - a[0, 0, 0] > 1e-6:
                x = 0.5 * (x + a[0, 0, 0] / x)
            out = x

    def validation(a, out, *, domain, origin):
        ni, nj, nk = domain
        sub = a[:ni, :nj, :nk]
        x = sub.copy()
        for _ in range(200):
            active = x * x - sub > 1e-6
            if not active.any():
                break
            x = np.where(active, 0.5 * (x + sub / x), x)
        out[:ni, :nj, :nk] = x


class TestThreeSectionScan(StencilTestSuite):
    dtypes = [np.float64]
    domain_range = [(1, 5), (1, 5), (4, 9)]
    symbols = dict(inp=field(in_range=(-2, 2)), out=field(in_range=(0, 0)))
    max_examples = 10

    def definition(inp, out):
        with gtscript.computation("FORWARD"):
            with gtscript.interval(0, 1):
                out = inp[0, 0, 0] * 2.0
            with gtscript.interval(1, -1):
                out = out[0, 0, -1] + inp[0, 0, 0]
            with gtscript.interval(-1, None):
                out = out[0, 0, -1] * 0.5

    def validation(inp, out, *, domain, origin):
        i0, j0, k0 = origin
        ni, nj, nk = domain
        sub = inp[i0 : i0 + ni, j0 : j0 + nj, k0 : k0 + nk]
        res = np.zeros_like(sub)
        res[:, :, 0] = sub[:, :, 0] * 2.0
        for k in range(1, nk - 1):
            res[:, :, k] = res[:, :, k - 1] + sub[:, :, k]
        if nk > 1:
            res[:, :, nk - 1] = res[:, :, nk - 2] * 0.5
        out[i0 : i0 + ni, j0 : j0 + nj, k0 : k0 + nk] = res


class TestFieldCondition(StencilTestSuite):
    dtypes = [np.float64, np.float32]
    domain_range = [(1, 8), (1, 8), (1, 5)]
    symbols = dict(
        a=field(in_range=(-5, 5)), b=field(in_range=(-5, 5)), out=field(in_range=(0, 0))
    )
    max_examples = 10

    def definition(a, b, out):
        with gtscript.computation("PARALLEL"), gtscript.interval(...):
            if a[0, 0, 0] > b[0, 0, 0]:
                out = a[0, 0, 0] - b[0, 0, 0]
            else:
                out = b[0, 0, 0] * 2.0

    def validation(a, b, out, *, domain, origin):
        ni, nj, nk = domain
        sa = a[:ni, :nj, :nk]
        sb = b[:ni, :nj, :nk]
        out[:ni, :nj, :nk] = np.where(sa > sb, sa - sb, sb * 2.0)


class TestAbsoluteK(StencilTestSuite):
    dtypes = [np.float64]
    domain_range = [(1, 6), (1, 6), (2, 7)]
    symbols = dict(a=field(in_range=(-4, 4)), out=field(in_range=(0, 0)))
    max_examples = 10

    def definition(a, out):
        with gtscript.computation("PARALLEL"), gtscript.interval(...):
            out = a[0, 0, 0] - a.at(K=0)

    def validation(a, out, *, domain, origin):
        i0, j0, k0 = origin
        ni, nj, nk = domain
        sub = a[i0 : i0 + ni, j0 : j0 + nj, k0 : k0 + nk]
        out[i0 : i0 + ni, j0 : j0 + nj, k0 : k0 + nk] = sub - sub[:, :, :1]


class TestNativeFunctions(StencilTestSuite):
    dtypes = [np.float64, np.float32]
    domain_range = [(1, 8), (1, 8), (1, 4)]
    symbols = dict(
        a=field(in_range=(0.125, 4.0)),  # f32-exact bound (hypothesis requirement)
        b=field(in_range=(-2, 2)),
        out=field(in_range=(0, 0)),
    )
    max_examples = 10

    def definition(a, b, out):
        with gtscript.computation("PARALLEL"), gtscript.interval(...):
            out = sqrt(a[0, 0, 0]) + exp(b[0, 0, 0]) * 0.1 + log(a[0, 0, 0]) + min(
                abs(b[0, 0, 0]), a[0, 0, 0]
            ) - max(a[0, 0, 0], b[0, 0, 0])

    def validation(a, b, out, *, domain, origin):
        ni, nj, nk = domain
        sa = a[:ni, :nj, :nk]
        sb = b[:ni, :nj, :nk]
        out[:ni, :nj, :nk] = (
            np.sqrt(sa)
            + np.exp(sb) * 0.1
            + np.log(sa)
            + np.minimum(np.abs(sb), sa)
            - np.maximum(sa, sb)
        )


class TestIntegerArithmetic(StencilTestSuite):
    dtypes = [np.int32, np.int64]
    domain_range = [(1, 8), (1, 8), (1, 4)]
    symbols = dict(
        a=field(in_range=(-20, 20)), b=field(in_range=(1, 7)), out=field(in_range=(0, 0))
    )
    max_examples = 10

    def definition(a, b, out):
        with gtscript.computation("PARALLEL"), gtscript.interval(...):
            out = a[0, 0, 0] * b[0, 0, 0] + a[0, 0, 0] % b[0, 0, 0]

    def validation(a, b, out, *, domain, origin):
        ni, nj, nk = domain
        sa = a[:ni, :nj, :nk]
        sb = b[:ni, :nj, :nk]
        out[:ni, :nj, :nk] = sa * sb + sa % sb


class TestMaskedScanCarry(StencilTestSuite):
    """Sequential carry under a field-condition mask: the scan must keep the
    previous carry where the mask is false."""

    dtypes = [np.float64]
    domain_range = [(1, 5), (1, 5), (3, 8)]
    symbols = dict(inp=field(in_range=(-3, 3)), out=field(in_range=(0, 0)))
    max_examples = 10

    def definition(inp, out):
        with gtscript.computation("FORWARD"):
            with gtscript.interval(0, 1):
                out = inp[0, 0, 0]
            with gtscript.interval(1, None):
                out = out[0, 0, -1]
                if inp[0, 0, 0] > 0.0:
                    out = out[0, 0, -1] + inp[0, 0, 0]

    def validation(inp, out, *, domain, origin):
        i0, j0, k0 = origin
        ni, nj, nk = domain
        sub = inp[i0 : i0 + ni, j0 : j0 + nj, k0 : k0 + nk]
        res = np.zeros_like(sub)
        res[:, :, 0] = sub[:, :, 0]
        for k in range(1, nk):
            res[:, :, k] = np.where(
                sub[:, :, k] > 0.0, res[:, :, k - 1] + sub[:, :, k], res[:, :, k - 1]
            )
        out[i0 : i0 + ni, j0 : j0 + nj, k0 : k0 + nk] = res
