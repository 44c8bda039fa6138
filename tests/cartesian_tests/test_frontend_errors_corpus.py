"""Second GTScript frontend diagnostics corpus: reference-derived cases
from /root/reference/tests/cartesian_tests/unit_tests/frontend_tests/
test_gtscript_frontend.py (TestAxisSyntax, TestFunctionReturn,
TestAbsoluteIndex, TestDataDimensions, TestAssignmentSyntax,
TestRegions, TestIntervalSyntax, TestInlinedExternals error paths) that
round-4's corpus (test_frontend_errors.py) did not yet cover."""

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
    I,
    J,
    K,
    computation,
    horizontal,
    interval,
    region,
)

Field3D = gtscript.Field[np.float64]
FieldK = gtscript.Field[(K,), np.float64]
Field4 = gtscript.Field[(np.float64, (4,))]


def _parse(defn, **options):
    options.setdefault("externals", {})
    options.setdefault("dtypes", {})
    return parse_stencil(defn, options)


def _fails(defn, match, *, error=GTScriptSyntaxError, **options):
    with pytest.raises(error, match=match):
        _parse(defn, **options)


# --- axis syntax (reference TestAxisSyntax) ----------------------------------


def test_duplicate_axes_rejected():
    with pytest.raises(ValueError, match="repeat"):
        gtscript.Field[(I, I), np.float64]


def test_out_of_order_axes_rejected():
    with pytest.raises(ValueError, match="order"):
        gtscript.Field[(K, I), np.float64]


def test_good_axis_subsets_accepted():
    for axes in [(I,), (J,), (K,), (I, J), (I, K), (J, K), (I, J, K)]:
        desc = gtscript.Field[axes, np.float64]
        assert desc.axes == axes


# --- function return shapes (reference TestFunctionReturn) -------------------


def test_function_tuple_return_arity_mismatch():
    @gtscript.function
    def two_values(arg):
        return 1.0, 2.0

    def s(phi: Field3D):
        with computation(PARALLEL), interval(...):
            phi = two_values(phi)

    _fails(s, "(?i)return|unpack|match")


def test_function_multiple_return_statements_rejected():
    @gtscript.function
    def multi(arg):
        return 1.0
        return 2.0

    def s(phi: Field3D):
        with computation(PARALLEL), interval(...):
            phi = multi(phi)

    _fails(s, "(?i)return")


def test_function_tuple_return_ok():
    @gtscript.function
    def return_tuple():
        tmp1 = 1.0
        tmp2 = 2.0
        return tmp1, tmp2

    def s(res1: Field3D, res2: Field3D):
        with computation(PARALLEL), interval(...):
            res1, res2 = return_tuple()

    _parse(s)


def test_function_call_in_if_condition_rejected():
    @gtscript.function
    def boolean_return(f):
        return f > 0.0

    def s(field: Field3D):
        with computation(PARALLEL), interval(...):
            field = 0.0
            if boolean_return(field):
                field = 1.0

    _fails(s, "(?i)condition|call")


# --- absolute K index (reference TestAbsoluteIndex) --------------------------


def test_at_without_k_rejected():
    def s(a: Field3D, b: Field3D):
        with computation(FORWARD), interval(...):
            b = a.at()

    _fails(s, "(?i)K")


def test_at_with_ij_axis_rejected():
    def s(a: Field3D, b: Field3D):
        with computation(FORWARD), interval(...):
            b = a.at(I=0, K=0)

    _fails(s, "(?i)K|I")


# --- data dimensions (reference TestDataDimensions) --------------------------


def test_data_dim_static_out_of_bounds_rejected():
    def s(a: Field4, b: Field3D):
        with computation(PARALLEL), interval(...):
            b = a[0, 0, 0][4]

    _fails(s, "(?i)bounds|data|index")


def test_data_dims_must_be_indexed():
    """Detected at pipeline time (vector_unroll): a whole-vector value
    assigned to a scalar field means the data dims were never indexed."""

    def s(a: Field4, b: Field3D):
        with computation(PARALLEL), interval(...):
            b = a[0, 0, 0]

    with pytest.raises(GTScriptSyntaxError, match="(?i)data dimension"):
        gtscript.stencil(backend="numpy", definition=s)


# --- assignment syntax (reference TestAssignmentSyntax) ----------------------


def test_slice_assignment_rejected():
    def s(a: Field3D, b: Field3D):
        with computation(PARALLEL), interval(...):
            b[1:2, 0, 0] = a

    _fails(s, "(?i)slice|offset|subscript")


def test_augmented_assignment_with_offset_rejected():
    def s(a: Field3D):
        with computation(PARALLEL), interval(...):
            a[1, 0, 0] += 1.0

    _fails(s, "(?i)offset|augment")


def test_augmented_assignment_zero_offset_ok():
    def s(a: Field3D):
        with computation(PARALLEL), interval(...):
            a[0, 0, 0] += 2.0

    _parse(s)


# --- regions (reference TestRegions error paths) ------------------------------


def test_region_requires_two_subscripts():
    with pytest.raises(ValueError, match="two subscripts"):
        region[1:2]


def test_nested_horizontal_rejected():
    def s(a: Field3D):
        with computation(PARALLEL), interval(...):
            with horizontal(region[I[0]:I[1], :]):
                with horizontal(region[:, J[0]:J[1]]):
                    a = 1.0

    _fails(s, "(?i)nested|horizontal")


# --- intervals (reference TestIntervalSyntax error paths) ---------------------


def test_reversed_interval_rejected():
    def s(a: Field3D):
        with computation(PARALLEL), interval(2, 1):
            a = 1.0

    _fails(s, "(?i)interval|empty|reversed|order")


def test_interval_nonoverlapping_accepted():
    def s(a: Field3D):
        with computation(PARALLEL):
            with interval(0, 2):
                a = 1.0
            with interval(2, None):
                a = 2.0

    _parse(s)


# --- externals (reference TestInlinedExternals error paths) -------------------


def test_external_wrong_value_type_rejected():
    def s(a: Field3D):
        from __externals__ import WEIRD  # noqa: F401

        with computation(PARALLEL), interval(...):
            a = a + WEIRD  # noqa: F821

    with pytest.raises((GTScriptSyntaxError, GTScriptDefinitionError, TypeError)):
        _parse(s, externals={"WEIRD": "a-string"})


def test_np_bool_external_accepted():
    from gt4py_tpu.cartesian.gtscript import __INLINED  # noqa: F401

    def s(a: Field3D):
        from __externals__ import FLAG  # noqa: F401

        with computation(PARALLEL), interval(...):
            if __INLINED(FLAG):  # noqa: F821
                a = 1.0
            else:
                a = 2.0

    _parse(s, externals={"FLAG": np.bool_(True)})


# --- K-only fields ------------------------------------------------------------


def test_write_k_field_in_parallel_accepted_with_mask():
    """A K-only write from a PARALLEL computation is IJ-constant; the
    frontend accepts it (matching the reference, which allows lower-dim
    writes when unambiguous)."""

    def s(a: FieldK, b: Field3D):
        with computation(FORWARD), interval(...):
            a = 1.0
            b = a

    _parse(s)
