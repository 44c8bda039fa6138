"""eve.type_validation: the standalone runtime type-check kit
(reference gt4py/eve/type_validation.py) and its datamodels wiring."""

from typing import Any, Dict, List, Optional, Tuple, Union

import pytest

from gt4py_tpu import eve
from gt4py_tpu.eve import datamodels
from gt4py_tpu.eve.type_validation import (
    TypeValidationError,
    assert_type,
    simple_type_validator,
)


@pytest.mark.parametrize(
    "value,annotation",
    [
        (1, int),
        (1.5, float),
        (3, float),  # int-as-float accepted
        ("x", str),
        (None, Optional[int]),
        (2, Optional[int]),
        ([1, 2], List[int]),
        ((1, "a"), Tuple[int, str]),
        ((1, 2, 3), Tuple[int, ...]),
        ({"a": 1}, Dict[str, int]),
        ({1, 2}, set),
        (1, Union[int, str]),
        ("s", Union[int, str]),
        (object(), Any),
    ],
)
def test_accepts(value, annotation):
    assert_type(value, annotation)


@pytest.mark.parametrize(
    "value,annotation",
    [
        ("x", int),
        (None, int),
        ([1, "a"], List[int]),
        ((1,), Tuple[int, str]),
        ((1, "a", 2.0), Tuple[int, str]),
        ({"a": "b"}, Dict[str, int]),
        (1.5, Union[int, str]),
        ([1], tuple),
    ],
)
def test_rejects(value, annotation):
    with pytest.raises(TypeValidationError):
        assert_type(value, annotation)


def test_validator_factory():
    v = simple_type_validator(List[int], "xs")
    v([1, 2, 3])
    with pytest.raises(TypeValidationError, match="'xs'"):
        v([1, "two"])


def test_datamodels_delegate():
    @datamodels.datamodel
    class Point:
        x: int
        y: float

    Point(x=1, y=2.0)
    with pytest.raises(datamodels.ValidationError):
        Point(x="no", y=2.0)
    # datamodels' error subclasses TypeError like the kit's
    assert issubclass(datamodels.ValidationError, TypeError)
