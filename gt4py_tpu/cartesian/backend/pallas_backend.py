"""Pallas TPU backend (fused-kernel path).

Counterpart of the reference's ``gt:gpu`` CUDA backend
(/root/reference/src/gt4py/cartesian/backend/gtcpp_backend.py:169): the
whole stencil executes as one fused Pallas kernel per IJ tile — VMEM-resident
temporaries, in-kernel K scans, manual-DMA halo windows (pallas_codegen.py).
Stencils using features the kernel generator does not cover yet fall back
to the XLA-traced path (jax_backend.py) transparently.

Off-TPU (tests on the CPU mesh) kernels run in the Pallas interpreter.
"""

from __future__ import annotations

import warnings
from typing import Any

from gt4py_tpu.cartesian.backend.base import register
from gt4py_tpu.cartesian.backend.jax_backend import JaxBackend
from gt4py_tpu.cartesian.backend.pallas_codegen import (
    PallasUnsupported,
    build_pallas_fn,
)


@register
class PallasBackend(JaxBackend):
    name = "tpu:pallas"
    array_kind = "jax"
    storage_info = {"alignment": 128, "device": "tpu"}

    def _build(self, domain, origins_key):
        import jax

        origins = dict(origins_key)
        try:
            interpret = jax.default_backend() != "tpu"
            pallas_fn = build_pallas_fn(
                self.analyzed, domain, origins, interpret=interpret
            )
        except PallasUnsupported as e:
            warnings.warn(
                f"tpu:pallas falling back to XLA path for stencil "
                f"'{self.analyzed.name}': {e}",
                stacklevel=2,
            )
            return super()._build(domain, origins_key)

        written = self.written

        def fn(written_arrays, read_arrays, scalars):
            arrays = {**read_arrays, **written_arrays}
            out = pallas_fn(arrays, scalars)
            return {n: out[n] for n in written}

        return jax.jit(fn, donate_argnums=(0,))
