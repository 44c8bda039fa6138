"""Core dtype/device definitions.

TPU-native equivalent of the reference's ``gt4py._core.definitions``
(/root/reference/src/gt4py/_core/definitions.py:146,198,388): a dtype model
bridging NumPy and JAX dtypes and a device model where the accelerator is a
TPU chip addressed through JAX rather than a CUDA/ROCm device.
"""

from __future__ import annotations

import enum
from typing import Any

import numpy as np


# Default precision of untyped Python literals in the DSL (reference:
# gt4py.cartesian.gt_definitions.LITERAL_INT_PRECISION / LITERAL_FLOAT_PRECISION).
LITERAL_INT_PRECISION = 64
LITERAL_FLOAT_PRECISION = 64


class DeviceType(enum.Enum):
    """Execution device (reference: _core/definitions.py:388 — CPU/CUDA/ROCM;
    here the accelerator is a TPU)."""

    CPU = "cpu"
    TPU = "tpu"


class DType:
    """Thin wrapper around a NumPy dtype with DSL-relevant queries
    (reference: _core/definitions.py:198)."""

    __slots__ = ("np_dtype",)

    def __init__(self, dtype_like: Any):
        if isinstance(dtype_like, DType):
            self.np_dtype = dtype_like.np_dtype
        else:
            self.np_dtype = np.dtype(dtype_like)

    @property
    def name(self) -> str:
        return self.np_dtype.name

    @property
    def kind(self) -> str:
        return self.np_dtype.kind

    @property
    def itemsize(self) -> int:
        return self.np_dtype.itemsize

    @property
    def is_bool(self) -> bool:
        return self.np_dtype.kind == "b"

    @property
    def is_integer(self) -> bool:
        return self.np_dtype.kind in ("i", "u")

    @property
    def is_float(self) -> bool:
        return self.np_dtype.kind == "f"

    def __eq__(self, other: Any) -> bool:
        if isinstance(other, DType):
            return self.np_dtype == other.np_dtype
        try:
            return self.np_dtype == np.dtype(other)
        except TypeError:
            return NotImplemented

    def __hash__(self) -> int:
        return hash(self.np_dtype)

    def __repr__(self) -> str:
        return f"DType({self.np_dtype.name})"


def upcast(a: np.dtype, b: np.dtype) -> np.dtype:
    """Implicit binary-op result dtype, matching the reference's upcasting
    rules (gtc/passes/gtir_upcaster.py): standard NumPy promotion."""
    return np.promote_types(a, b)
