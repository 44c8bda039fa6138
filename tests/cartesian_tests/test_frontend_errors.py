"""GTScript frontend diagnostics (reference
tests/cartesian_tests/frontend_tests/test_gtscript_frontend.py — the
reference's largest frontend suite: every class of invalid program raises
a precise, located GTScriptSyntaxError, not a generic crash)."""

import numpy as np
import pytest

from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.cartesian.frontend import (
    GTScriptDefinitionError,
    GTScriptSyntaxError,
    parse_stencil,
)
from gt4py_tpu.cartesian.gtscript import (
    BACKWARD,
    FORWARD,
    PARALLEL,
    __INLINED,
    compile_assert,
    computation,
    interval,
)

Field3D = gtscript.Field[np.float64]
Table4 = gtscript.GlobalTable[(np.float64, (4,))]


def _parse(defn, **options):
    options.setdefault("externals", {})
    options.setdefault("dtypes", {})
    return parse_stencil(defn, options)


def _fails(defn, match, *, error=GTScriptSyntaxError, **options):
    with pytest.raises(error, match=match):
        _parse(defn, **options)


# --- definition-level -----------------------------------------------------


def test_missing_annotation():
    def s(a, b: Field3D):
        with computation(PARALLEL), interval(...):
            b = a

    _fails(s, "Missing type annotation for parameter 'a'", error=GTScriptDefinitionError)


def test_variadic_params_rejected():
    def s(a: Field3D, *rest: Field3D):
        with computation(PARALLEL), interval(...):
            a = 1.0

    _fails(s, "Variadic parameter", error=GTScriptDefinitionError)


def test_empty_stencil_rejected():
    def s(a: Field3D):
        """Docstring only."""

    _fails(s, "at least one computation")


def test_pass_statement_rejected():
    def s(a: Field3D):
        pass

    _fails(s, "top level")


def test_return_rejected():
    def s(a: Field3D):
        with computation(PARALLEL), interval(...):
            a = 1.0
        return a

    _fails(s, "top level|return")


def test_toplevel_statement_rejected():
    def s(a: Field3D):
        x = 1
        with computation(PARALLEL), interval(...):
            a = x

    _fails(s, "computation")


# --- symbols / names ------------------------------------------------------


def test_unknown_symbol():
    def s(a: Field3D):
        with computation(PARALLEL), interval(...):
            a = undefined_thing  # noqa: F821

    _fails(s, "Unknown symbol 'undefined_thing'")


def test_missing_external():
    def s(a: Field3D):
        from __externals__ import MISSING  # noqa: F401

        with computation(PARALLEL), interval(...):
            a = MISSING  # noqa: F821

    _fails(s, "Missing external 'MISSING'")


def test_import_outside_externals_rejected():
    def s(a: Field3D):
        from os import path  # noqa: F401

        with computation(PARALLEL), interval(...):
            a = 1.0

    _fails(s, "Cannot import from 'os'")


def test_assign_to_scalar_param_rejected():
    def s(a: Field3D, w: float):
        with computation(PARALLEL), interval(...):
            w = 1.0

    _fails(s, "Cannot assign to scalar parameter 'w'")


def test_assign_to_global_table_rejected():
    def s(a: Field3D, t: Table4):
        with computation(PARALLEL), interval(...):
            t = 1.0

    _fails(s, "Cannot assign to GlobalTable 't'")


def test_global_table_unsubscripted_rejected():
    def s(a: Field3D, t: Table4):
        with computation(PARALLEL), interval(...):
            a = t

    _fails(s, "must be subscripted")


# --- computation / interval structure -------------------------------------


def test_bad_with_block():
    def s(a: Field3D):
        with open("/dev/null"):
            a = 1.0

    _fails(s, "computation")


def test_interval_bounds_must_be_static():
    def s(a: Field3D, n: float):
        with computation(PARALLEL), interval(0, n):
            a = 1.0

    _fails(s, "compile-time integer|Invalid|interval")


def test_overlapping_intervals_rejected():
    def s(a: Field3D):
        with computation(FORWARD):
            with interval(0, 2):
                a = 1.0
            with interval(1, 3):
                a = 2.0

    _fails(s, "Overlapping intervals")


def test_nested_with_inside_computation_rejected():
    def s(a: Field3D):
        with computation(PARALLEL), interval(...):
            with open("/dev/null"):
                a = 1.0

    _fails(s, "inside computations")


# --- assignments ----------------------------------------------------------


def test_offset_write_rejected():
    def s(a: Field3D, b: Field3D):
        with computation(PARALLEL), interval(...):
            b[1, 0, 0] = a

    _fails(s, "zero offset")


def test_chained_assignment_rejected():
    def s(a: Field3D, b: Field3D):
        with computation(PARALLEL), interval(...):
            a = b = 1.0

    _fails(s, "Chained assignments")


def test_mismatched_tuple_assignment_rejected():
    def s(a: Field3D, b: Field3D):
        with computation(PARALLEL), interval(...):
            a, b = 1.0

    _fails(s, "Mismatched tuple assignment|tuple")


def test_annotated_declaration_without_value_rejected():
    def s(a: Field3D):
        with computation(PARALLEL), interval(...):
            tmp: np.float64
            a = 1.0

    _fails(s, "Annotated declarations require a value")


def test_expression_statement_rejected():
    def s(a: Field3D):
        with computation(PARALLEL), interval(...):
            a + 1.0
            a = 1.0

    _fails(s, "no effect")


# --- expressions ----------------------------------------------------------


def test_string_literal_rejected():
    def s(a: Field3D):
        with computation(PARALLEL), interval(...):
            a = "nope"

    _fails(s, "literal|value")


def test_nonstatic_horizontal_offset_rejected():
    def s(a: Field3D, b: Field3D, n: float):
        with computation(PARALLEL), interval(...):
            b = a[n, 0, 0]

    _fails(s, "compile-time integers")


def test_unknown_function_rejected():
    def s(a: Field3D):
        with computation(PARALLEL), interval(...):
            a = len(a)

    _fails(s, "Cannot call 'len'")


def test_abs_arity():
    def s(a: Field3D):
        with computation(PARALLEL), interval(...):
            a = abs(a, a)

    _fails(s, "abs expects one argument")


def test_min_arity():
    def s(a: Field3D):
        with computation(PARALLEL), interval(...):
            a = min(a)

    _fails(s, "at least two arguments")


def test_inlined_requires_compile_time():
    def s(a: Field3D, w: float):
        with computation(PARALLEL), interval(...):
            if __INLINED(w):
                a = 1.0

    _fails(s, "compile-time")


def test_at_requires_field():
    def s(a: Field3D, w: float):
        with computation(PARALLEL), interval(...):
            a = w.at(K=0)

    _fails(s, "requires a field|Unknown|at")


def test_while_else_rejected():
    def s(a: Field3D):
        with computation(PARALLEL), interval(...):
            while a < 1.0:
                a = a + 1.0
            else:
                a = 0.0

    _fails(s, "'while ... else' is not supported")


def test_compile_assert_failure_is_located():
    def s(a: Field3D):
        with computation(PARALLEL), interval(...):
            compile_assert(1 == 2)
            a = 1.0

    _fails(s, "compile_assert|assert")


# --- gtscript.function inlining -------------------------------------------


def test_function_without_return_rejected():
    @gtscript.function
    def helper(x):
        y = x + 1.0  # noqa: F841

    def s(a: Field3D, b: Field3D):
        with computation(PARALLEL), interval(...):
            b = helper(a)

    _fails(s, "has no return")


def test_function_too_many_args_rejected():
    @gtscript.function
    def helper(x):
        return x + 1.0

    def s(a: Field3D, b: Field3D):
        with computation(PARALLEL), interval(...):
            b = helper(a, a)

    _fails(s, "Too many arguments")


# --- located errors -------------------------------------------------------


def test_error_carries_location():
    def s(a: Field3D):
        with computation(PARALLEL), interval(...):
            a = undefined_thing  # noqa: F821

    try:
        _parse(s)
        raise AssertionError("expected GTScriptSyntaxError")
    except GTScriptSyntaxError as e:
        loc = getattr(e, "loc", None) or (e.args[1] if len(e.args) > 1 else None)
        assert loc is not None
        assert "test_frontend_errors" in str(getattr(loc, "filename", loc))


# --- valid edge programs that must NOT error -------------------------------


def test_backward_interval_order_accepted():
    def s(a: Field3D):
        with computation(BACKWARD), interval(...):
            a = 1.0

    _parse(s)


def test_masked_dims_accepted():
    Field2D = gtscript.Field[gtscript.IJ, np.float64]

    def s(a: Field3D, m: Field2D):
        with computation(PARALLEL), interval(...):
            a = a + m

    _parse(s)
