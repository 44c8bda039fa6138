"""Eager NumPy backend — the reference's ``numpy`` backend equivalent
(/root/reference/src/gt4py/cartesian/backend/numpy_backend.py:29): vectorized
execution with exact NumPy promotion/mask semantics. Serves as the
correctness oracle for the compiled backends; mutates input arrays in place.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from gt4py_tpu.cartesian.backend.base import Backend, register
from gt4py_tpu.cartesian.backend.evaluator import Evaluator
from gt4py_tpu.cartesian.definitions import AccessKind


@register
class NumpyBackend(Backend):
    name = "numpy"
    array_kind = "numpy"
    storage_info = {"alignment": 1, "device": "cpu"}

    def run(self, arrays, scalars, domain, origins) -> dict[str, Any]:
        ev = Evaluator(
            self.analyzed,
            domain,
            origins,
            {k: np.asarray(v) for k, v in arrays.items()},
            scalars,
            ns="numpy",
        )
        out = ev.run()
        return {
            name: out[name]
            for name, info in self.analyzed.field_infos.items()
            if info.access & AccessKind.WRITE
        }
