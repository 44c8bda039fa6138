"""Error locations point at the exact offending line/column (ported
behaviors from /root/reference/tests/next_tests/unit_tests/
ffront_tests/test_func_to_foast_error_line_number.py — sensitive to
line numbers by design: location regressions must fail loudly)."""

import inspect

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import errors

TDim = gtx.Dimension("TDim")
TField = gtx.Field[gtx.Dims[TDim], np.float64]


def test_undefined_symbol_location_is_exact():
    line = inspect.getframeinfo(inspect.currentframe()).lineno

    def broken(inp: TField) -> TField:
        good = inp * 2.0  # noqa: F841
        return missing_name  # noqa: F821  <-- error line

    with pytest.raises(errors.UndefinedSymbolError) as exc_info:
        gtx.field_operator(broken)

    loc = exc_info.value.location
    assert loc is not None
    assert "test_error_line_numbers.py" in (loc.filename or "")
    assert loc.line == line + 4  # the `return missing_name` line


def test_type_error_location_is_exact():
    line = inspect.getframeinfo(inspect.currentframe()).lineno

    def bad_types(a: TField, b: TField) -> TField:
        fine = a + b  # noqa: F841
        return (a > b) + 1.0  # <-- bool arithmetic error line

    with pytest.raises(errors.DSLTypeError) as exc_info:
        gtx.field_operator(bad_types)

    loc = exc_info.value.location
    assert loc is not None
    assert loc.line == line + 4


def test_rendered_error_shows_offending_source_line():
    def oops(a: TField) -> TField:
        return a + not_a_thing  # noqa: F821

    with pytest.raises(errors.DSLError) as exc_info:
        gtx.field_operator(oops)

    rendered = str(exc_info.value)
    assert "return a + not_a_thing" in rendered
    assert "^" in rendered  # caret column marker


def test_program_error_location():
    @gtx.field_operator
    def op(a: TField) -> TField:
        return a

    line = inspect.getframeinfo(inspect.currentframe()).lineno

    with pytest.raises(errors.DSLError) as exc_info:

        @gtx.program
        def prog(a):
            op(a)  # <-- missing out= error line

    loc = exc_info.value.location
    assert loc is not None
    assert loc.line == line + 6
