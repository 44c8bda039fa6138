"""Build orchestration veneer: definition function → StencilObject.

Counterpart of the reference's ``loader.py``
(/root/reference/src/gt4py/cartesian/loader.py:53): delegates to
:class:`gt4py_tpu.cartesian.stencil_builder.StencilBuilder`, which owns
the frontend→pipeline→backend thread, the in-process memo, and the
persistent build-data record."""

from __future__ import annotations

from typing import Callable

from gt4py_tpu.cartesian.stencil_builder import StencilBuilder
from gt4py_tpu.cartesian.stencil_object import StencilObject


def load_stencil(definition: Callable, build_options: dict) -> StencilObject:
    return StencilBuilder(definition, options=build_options).build()
