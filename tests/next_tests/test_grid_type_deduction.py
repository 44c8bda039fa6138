"""Grid-type deduction (ported behaviors from
/root/reference/tests/next_tests/unit_tests/ffront_tests/
test_decorator_domain_deduction.py: cartesian vs unstructured
classification of offsets/dims, request validation)."""

import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import deduce_grid_type

Dim = gtx.Dimension("Dim")
LocalDim = gtx.Dimension("LocalDim", kind=gtx.DimensionKind.LOCAL)

CartesianOffset = gtx.FieldOffset("CartesianOffset", source=Dim, target=(Dim,))
UnstructuredOffset = gtx.FieldOffset(
    "UnstructuredOffset", source=Dim, target=(Dim, LocalDim)
)


def test_deduction_cartesian():
    assert deduce_grid_type(None, {CartesianOffset}) == gtx.GridType.CARTESIAN
    assert deduce_grid_type(None, {Dim}) == gtx.GridType.CARTESIAN


def test_deduction_unstructured():
    assert (
        deduce_grid_type(None, {UnstructuredOffset})
        == gtx.GridType.UNSTRUCTURED
    )
    assert deduce_grid_type(None, {LocalDim}) == gtx.GridType.UNSTRUCTURED
    # same value, different kind -> not a cartesian self-shift
    HDim = gtx.Dimension("X", kind=gtx.DimensionKind.HORIZONTAL)
    VDim = gtx.Dimension("X", kind=gtx.DimensionKind.VERTICAL)
    CrossKindOffset = gtx.FieldOffset("CrossKind", source=HDim, target=(VDim,))
    assert (
        deduce_grid_type(None, {CrossKindOffset}) == gtx.GridType.UNSTRUCTURED
    )
    LocalSelfOffset = gtx.FieldOffset(
        "LocalSelf", source=LocalDim, target=(LocalDim,)
    )
    assert (
        deduce_grid_type(None, {LocalSelfOffset}) == gtx.GridType.UNSTRUCTURED
    )


def test_request_cartesian_validates():
    assert (
        deduce_grid_type(gtx.GridType.CARTESIAN, {CartesianOffset})
        == gtx.GridType.CARTESIAN
    )
    with pytest.raises(ValueError, match="unstructured.*found"):
        deduce_grid_type(gtx.GridType.CARTESIAN, {UnstructuredOffset})
    with pytest.raises(ValueError, match="unstructured.*found"):
        deduce_grid_type(gtx.GridType.CARTESIAN, {LocalDim})


def test_request_unstructured_always_ok():
    assert (
        deduce_grid_type(gtx.GridType.UNSTRUCTURED, {UnstructuredOffset})
        == gtx.GridType.UNSTRUCTURED
    )
    # cartesian offsets are a special case of unstructured
    assert (
        deduce_grid_type(gtx.GridType.UNSTRUCTURED, {CartesianOffset})
        == gtx.GridType.UNSTRUCTURED
    )
