"""PAST pipeline tests: program lowering/codegen, decoration-time type
checking, dead-temporary elimination, fallback honesty.

Reference analog: tests/next_tests/unit_tests/ffront_tests/test_func_to_past.py
+ past_passes/test_type_deduction.py + ProgramLowering checks."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import Dimension, DimensionKind, errors
from gt4py_tpu.next import past

I = Dimension("I")
J = Dimension("J")
K = Dimension("K", kind=DimensionKind.VERTICAL)

IJField = gtx.Field[gtx.Dims[I, J], gtx.float64]


@gtx.field_operator
def _double(a: IJField) -> IJField:
    return a * 2.0


@gtx.field_operator
def _add(a: IJField, b: IJField) -> IJField:
    return a + b


def _f(seed=0, shape=(6, 5)):
    rng = np.random.default_rng(seed)
    return gtx.as_field([I, J], rng.uniform(-1, 1, size=shape))


# --- lowering / codegen / execution -------------------------------------------------


@gtx.field_operator
def _scale(a: IJField, s: gtx.float64) -> IJField:
    return a * s


def test_program_through_past_pipeline():
    @gtx.program
    def prog(a, b, out):
        s = 2.0 * 2.0              # folds to 4.0 (consumed by _scale)
        tmp = s + 1.0              # dead chain: tmp feeds only waste
        waste = tmp + 1.0          # noqa: F841  dead temporary
        _scale(a, s, out=b)
        _add(a, b, out=out)

    src = prog.inspect(stage="past")
    assert "waste" not in src and "tmp" not in src and "4.0" in src
    assert "_scale(a, s, out=b)" in src
    a, b, out = _f(1), gtx.zeros({I: 6, J: 5}), gtx.zeros({I: 6, J: 5})
    prog(a, b, out)
    np.testing.assert_allclose(out.asnumpy(), 5 * a.asnumpy(), rtol=1e-12)


def test_past_execution_matches_raw():
    @gtx.program
    def prog(a, out):
        _double(a, out=out)

    a = _f(2)
    out_a, out_b = gtx.zeros({I: 6, J: 5}), gtx.zeros({I: 6, J: 5})
    prog(a, out_a)
    prog.definition(a, out_b)
    np.testing.assert_array_equal(out_a.asnumpy(), out_b.asnumpy())


def test_past_fallback_reason_recorded():
    @gtx.program
    def prog(a, out):
        for _ in range(2):  # loops are outside the PAST subset
            _double(a, out=out)

    a = _f(3)
    out = gtx.zeros({I: 6, J: 5})
    prog(a, out)  # still correct through the raw definition
    np.testing.assert_allclose(out.asnumpy(), 2 * a.asnumpy())
    assert "statement For" in prog.__dict__["past_fallback_reason"]
    with pytest.raises(ValueError, match="outside the PAST subset"):
        prog.inspect(stage="past")


# --- decoration-time type checking ---------------------------------------------------


def test_program_type_check_bad_arg_dtype():
    with pytest.raises(errors.DSLTypeError, match="Argument 'a' of _double"):

        @gtx.program
        def prog(a: gtx.Field[gtx.Dims[I, J], gtx.float32], out: IJField):
            _double(a, out=out)


def test_program_type_check_out_extra_dim():
    with pytest.raises(errors.DSLTypeError, match="dimension"):

        @gtx.program
        def prog(a: IJField, out: gtx.Field[gtx.Dims[I, J, K], gtx.float64]):
            _double(a, out=out)


def test_program_type_check_out_dtype():
    with pytest.raises(errors.DSLTypeError, match="dtype"):

        @gtx.program
        def prog(a: IJField, out: gtx.Field[gtx.Dims[I, J], gtx.float32]):
            _double(a, out=out)


def test_program_type_check_unknown_kwarg():
    with pytest.raises(errors.DSLTypeError, match="no parameter 'c'"):

        @gtx.program
        def prog(a: IJField, out: IJField):
            _double(a, c=a, out=out)


def test_program_type_check_too_many_args():
    with pytest.raises(errors.DSLTypeError, match="takes 1 arguments but 2"):

        @gtx.program
        def prog(a: IJField, out: IJField):
            _double(a, a, out=out)


def test_program_unannotated_params_skip_checking():
    @gtx.program
    def prog(a, out):  # no annotations -> args unknowable -> no check
        _double(a, out=out)

    a = _f(4)
    out = gtx.zeros({I: 6, J: 5})
    prog(a, out)
    np.testing.assert_allclose(out.asnumpy(), 2 * a.asnumpy())


def test_program_scan_call_carry_is_implicit():
    @gtx.scan_operator(axis=K, forward=True, init=0.0)
    def cum(carry: gtx.float64, x: gtx.float64):
        return carry + x

    @gtx.program
    def prog(a: gtx.Field[gtx.Dims[I, K], gtx.float64],
             out: gtx.Field[gtx.Dims[I, K], gtx.float64]):
        cum(a, out=out)

    rng = np.random.default_rng(5)
    a = gtx.as_field([I, K], rng.uniform(-1, 1, (4, 7)))
    out = gtx.zeros({I: 4, K: 7})
    prog(a, out)
    np.testing.assert_allclose(out.asnumpy(), np.cumsum(a.asnumpy(), axis=1),
                               rtol=1e-12)


# --- IR-level unit coverage -----------------------------------------------------------


def test_func_to_past_ir_shape():
    def prog(a, out):
        _double(a, out=out)

    ir = past.func_to_past(prog)
    assert ir.name == "prog" and ir.params == ["a", "out"]
    (stmt,) = ir.body
    assert isinstance(stmt, past.CallStmt)
    assert "out" in stmt.call.kwargs


def test_past_codegen_roundtrip_executes():
    def prog(a, out):
        _double(a, out=out)

    compiled = past.compile_to_python(prog)
    assert compiled.reason is None
    a = _f(6)
    out = gtx.zeros({I: 6, J: 5})
    compiled.fn(a, out)
    np.testing.assert_allclose(out.asnumpy(), 2 * a.asnumpy())
