"""Pallas TPU backend (fused-kernel path).

Counterpart of the reference's ``gt:gpu`` CUDA backend
(/root/reference/src/gt4py/cartesian/backend/gtcpp_backend.py:169): the whole
stencil executes as Pallas kernels over VMEM tiles. Currently delegates the
general case to the XLA-traced path (jax_backend) while the specialized
fused kernels are built out; see ops/ for the kernel library.
"""

from __future__ import annotations

from gt4py_tpu.cartesian.backend.base import register
from gt4py_tpu.cartesian.backend.jax_backend import JaxBackend


@register
class PallasBackend(JaxBackend):
    name = "tpu:pallas"
    array_kind = "jax"
    storage_info = {"alignment": 128, "device": "tpu"}
