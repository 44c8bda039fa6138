"""Public typing aliases (reference src/gt4py/next/typing.py +
tests/next_tests/typing_tests/): the names users put in their own
signatures resolve, match the runtime objects the decorators produce,
and stay importable without pulling implementation modules into user
namespaces."""

import typing

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import typing as gtx_typing

IDim = gtx.Dimension("IDim")
KDim = gtx.Dimension("KDim", kind=gtx.DimensionKind.VERTICAL)
IField = gtx.Field[gtx.Dims[IDim], np.float64]


@gtx.field_operator
def _op(a: IField) -> IField:
    return a


@gtx.scan_operator(axis=KDim, init=0.0, forward=True)
def _scan(state: float, a: float) -> float:
    return state + a


@gtx.program
def _prog(a, out):
    _op(a, out=out)


def _unwrap(alias):
    """Annotated[X, ...] -> X."""
    args = typing.get_args(alias)
    return args[0] if args else alias


def test_all_exports_resolve():
    for name in gtx_typing.__all__:
        assert hasattr(gtx_typing, name), name


def test_decorated_objects_match_aliases():
    assert isinstance(_op, _unwrap(gtx_typing.FieldOperator))
    assert isinstance(_scan, _unwrap(gtx_typing.ScanOperator))
    assert isinstance(_prog, _unwrap(gtx_typing.Program))


def test_offset_provider_elements_match():
    elem = _unwrap(gtx_typing.OffsetProviderElem)
    allowed = typing.get_args(elem)
    # a Dimension is a valid provider element (cartesian shifts)
    assert isinstance(IDim, allowed)
    # a NeighborTable connectivity is a valid provider element
    conn = gtx.as_connectivity(
        [gtx.Dimension("V"), gtx.Dimension("V2V", kind=gtx.DimensionKind.LOCAL)],
        gtx.Dimension("V"),
        np.array([[0, 1], [1, 0]]),
    )
    assert isinstance(conn, allowed)


def test_backend_alias_matches_resolved_backend():
    from gt4py_tpu.next.backend import resolve

    be = resolve("jax")
    assert isinstance(be, _unwrap(gtx_typing.Backend))


def test_aliases_usable_in_annotations():
    def user_fn(
        op: gtx_typing.FieldOperator,
        providers: gtx_typing.OffsetProvider,
    ) -> gtx_typing.Program:
        return _prog

    assert user_fn(_op, {"Ioff": IDim}) is _prog
