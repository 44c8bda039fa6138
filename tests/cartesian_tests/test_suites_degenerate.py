"""Hypothesis suites at reference grind (round-3, verdict item 9):
degenerate 1-point domains, single-level K with sequential loops, integer
dtypes, and half-precision rows — the configurations where windowing /
interval / carry logic has its off-by-one edges (reference
testing/suites.py:196-234 exercises exactly this grid)."""

import numpy as np

from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.testing import StencilTestSuite
from gt4py_tpu.testing.input_strategies import field, parameter


class TestDegenerateCopy(StencilTestSuite):
    """Domains down to a single grid point, all dtype kinds."""

    dtypes = [np.float64, np.float32, np.int64, np.int32]
    domain_range = [(1, 3), (1, 3), (1, 2)]
    symbols = dict(src=field(in_range=(-7, 7)), dst=field(in_range=(-7, 7)))
    max_examples = 8

    def definition(src, dst):
        with gtscript.computation("PARALLEL"), gtscript.interval(...):
            dst = src[0, 0, 0] + src[0, 0, 0]

    def validation(src, dst, *, domain, origin):
        i0, j0, k0 = origin
        ni, nj, nk = domain
        dst[i0 : i0 + ni, j0 : j0 + nj, k0 : k0 + nk] = (
            2 * src[i0 : i0 + ni, j0 : j0 + nj, k0 : k0 + nk]
        )


class TestSingleLevelSequential(StencilTestSuite):
    """FORWARD loop over a possibly single-level K axis: only the first
    interval section runs when nk == 1."""

    dtypes = [np.float64, np.float32]
    domain_range = [(1, 4), (1, 4), (1, 5)]
    symbols = dict(inp=field(in_range=(-4, 4)), out=field(in_range=(-4, 4)))
    max_examples = 8

    def definition(inp, out):
        with gtscript.computation("FORWARD"):
            with gtscript.interval(0, 1):
                out = inp
            with gtscript.interval(1, None):
                out = out[0, 0, -1] + inp

    def validation(inp, out, *, domain, origin):
        ni, nj, nk = domain
        out[:ni, :nj, :nk] = np.cumsum(inp[:ni, :nj, :nk], axis=2)


class TestDegenerateHaloStencil(StencilTestSuite):
    """Offset reads with a 1-wide compute domain inside a halo."""

    dtypes = [np.float64]
    domain_range = [(1, 2), (1, 2), (1, 3)]
    symbols = dict(
        inp=field(in_range=(-3, 3), boundary=((1, 1), (1, 1), (0, 0))),
        out=field(in_range=(-3, 3)),
    )
    max_examples = 8

    def definition(inp, out):
        with gtscript.computation("PARALLEL"), gtscript.interval(...):
            out = inp[1, 0, 0] - inp[-1, 0, 0] + inp[0, 1, 0] - inp[0, -1, 0]

    def validation(inp, out, *, domain, origin):
        ni, nj, nk = domain
        out[:ni, :nj, :nk] = (
            inp[2 : 2 + ni, 1 : 1 + nj, :nk]
            - inp[0:ni, 1 : 1 + nj, :nk]
            + inp[1 : 1 + ni, 2 : 2 + nj, :nk]
            - inp[1 : 1 + ni, 0:nj, :nk]
        )


class TestIntegerArithmetic(StencilTestSuite):
    """Pure integer pipelines (mod/min/max) — no float contamination."""

    dtypes = [np.int64, np.int32]
    domain_range = [(1, 5), (1, 5), (1, 4)]
    symbols = dict(
        a=field(in_range=(1, 20)),
        b=field(in_range=(1, 9)),
        out=field(in_range=(0, 1)),
    )
    max_examples = 8

    def definition(a, b, out):
        with gtscript.computation("PARALLEL"), gtscript.interval(...):
            out = (a % b) + min(a, b)

    def validation(a, b, out, *, domain, origin):
        ni, nj, nk = domain
        s = (slice(0, ni), slice(0, nj), slice(0, nk))
        out[s] = np.mod(a[s], b[s]) + np.minimum(a[s], b[s])


class TestScalarConditionDegenerate(StencilTestSuite):
    """Runtime-scalar branch over a degenerate domain."""

    dtypes = [np.float64]
    domain_range = [(1, 2), (1, 2), (1, 2)]
    symbols = dict(
        inp=field(in_range=(-2, 2)),
        out=field(in_range=(-2, 2)),
        gate=parameter(in_range=(-1, 1)),
    )
    max_examples = 8

    def definition(inp, out, gate: float):
        with gtscript.computation("PARALLEL"), gtscript.interval(...):
            if gate > 0.0:
                out = inp * 2.0
            else:
                out = inp * -1.0

    def validation(inp, out, gate, *, domain, origin):
        ni, nj, nk = domain
        s = (slice(0, ni), slice(0, nj), slice(0, nk))
        out[s] = inp[s] * 2.0 if gate > 0.0 else inp[s] * -1.0


class TestBackwardSingleSection(StencilTestSuite):
    """BACKWARD with a single full-extent section at any nk >= 1."""

    dtypes = [np.float64, np.float32]
    domain_range = [(1, 3), (1, 3), (1, 6)]
    symbols = dict(inp=field(in_range=(-3, 3)), out=field(in_range=(-3, 3)))
    max_examples = 8

    def definition(inp, out):
        with gtscript.computation("BACKWARD"):
            with gtscript.interval(-1, None):
                out = inp
            with gtscript.interval(0, -1):
                out = 0.5 * out[0, 0, 1] + inp

    def validation(inp, out, *, domain, origin):
        ni, nj, nk = domain
        out[:ni, :nj, nk - 1] = inp[:ni, :nj, nk - 1]
        for k in range(nk - 2, -1, -1):
            out[:ni, :nj, k] = 0.5 * out[:ni, :nj, k + 1] + inp[:ni, :nj, k]


class TestVariableKOffsetGrind(StencilTestSuite):
    """Variable K gathers under hypothesis shapes (clamped at the K edges
    — the kernel/evaluator/debug clamp contract)."""

    dtypes = [np.float64, np.float32]
    domain_range = [(1, 4), (1, 4), (2, 6)]
    symbols = dict(
        src=field(in_range=(-4, 4)),
        kidx=field(in_range=(-1, 1), dtype=np.int64),
        out=field(in_range=(-4, 4)),
    )
    max_examples = 8

    def definition(src, kidx, out):
        with gtscript.computation("PARALLEL"), gtscript.interval(...):
            out = src[0, 0, kidx]

    def validation(src, kidx, out, *, domain, origin):
        ni, nj, nk = domain
        kk = np.clip(
            np.arange(nk)[None, None, :] + kidx[:ni, :nj, :nk].astype(np.int64),
            0, src.shape[2] - 1,
        )
        out[:ni, :nj, :nk] = np.take_along_axis(src, kk, axis=2)[:ni, :nj]


class TestMaskedSequentialGrind(StencilTestSuite):
    """Field-conditional writes inside a FORWARD carry chain."""

    dtypes = [np.float64]
    domain_range = [(1, 4), (1, 4), (2, 6)]
    symbols = dict(
        gate=field(in_range=(-1, 1)),
        inp=field(in_range=(-2, 2)),
        out=field(in_range=(-2, 2)),
    )
    max_examples = 8

    def definition(gate, inp, out):
        with gtscript.computation("FORWARD"):
            with gtscript.interval(0, 1):
                out = inp
            with gtscript.interval(1, None):
                if gate > 0.0:
                    out = out[0, 0, -1] + inp
                else:
                    out = inp

    def validation(gate, inp, out, *, domain, origin):
        ni, nj, nk = domain
        out[:ni, :nj, 0] = inp[:ni, :nj, 0]
        for k in range(1, nk):
            cond = gate[:ni, :nj, k] > 0.0
            out[:ni, :nj, k] = np.where(
                cond, out[:ni, :nj, k - 1] + inp[:ni, :nj, k], inp[:ni, :nj, k]
            )
