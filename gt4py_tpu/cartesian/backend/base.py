"""Backend ABC and registry (reference: cartesian/backend/base.py:35,129).

A backend turns an :class:`AnalyzedStencil` into a runnable computation.
Unlike the reference — which generates source code, compiles extension
modules and imports them — TPU backends build Python callables around the
GTIR trace; XLA is the code generator and its persistent compilation cache
plays the role of the reference's ``.gt_cache`` (see caching.py).
"""

from __future__ import annotations

import abc
from typing import Any, Type

from gt4py_tpu.cartesian.passes.pipeline import AnalyzedStencil

REGISTRY: dict[str, Type["Backend"]] = {}


def register(cls: Type["Backend"]) -> Type["Backend"]:
    REGISTRY[cls.name] = cls
    return cls


def from_name(name: str) -> Type["Backend"]:
    if name not in REGISTRY:
        raise ValueError(
            f"Unknown backend '{name}'. Registered backends: {sorted(REGISTRY)}"
        )
    return REGISTRY[name]


class Backend(abc.ABC):
    """One compiled stencil on one backend."""

    #: registry name, e.g. "jax", "numpy", "debug", "tpu:pallas"
    name: str = ""
    #: which array type the backend consumes: "jax" or "numpy"
    array_kind: str = "jax"
    #: storage/layout info for the storage layer (API parity with
    #: reference Backend.storage_info)
    storage_info: dict = {"alignment": 1, "device": "tpu"}

    def __init__(self, analyzed: AnalyzedStencil, options: dict):
        self.analyzed = analyzed
        self.options = options

    @abc.abstractmethod
    def run(
        self,
        arrays: dict[str, Any],
        scalars: dict[str, Any],
        domain: tuple[int, int, int],
        origins: dict[str, tuple[int, int, int]],
    ) -> dict[str, Any]:
        """Execute; return {written_field_name: updated_array}."""

    #: backends whose ``run`` keys a dispatch cache can skip rebuilding the
    #: per-call shapes key when the runtime hands down its identity-free
    #: validation-cache key (shapes/dtypes/origins/domain — see
    #: stencil_object._call_run)
    accepts_cache_key = False

    def run_from_infos(
        self,
        infos: dict[str, Any],
        scalars: dict[str, Any],
        domain: tuple[int, int, int],
        origins: dict[str, tuple[int, int, int]],
        cache_key: Any = None,
    ) -> dict[str, Any]:
        """Execute from per-argument infos (lazy arrays). The default
        materializes public arrays; layout-aware backends override this to
        consume storages' native-layout caches directly."""
        import numpy as np

        arrays = {}
        for name, info in infos.items():
            value = info.array
            if self.array_kind == "jax":
                if isinstance(value, np.ndarray):
                    import jax.numpy as jnp

                    value = jnp.asarray(value)
            else:
                value = np.asarray(value)
                if not value.flags.writeable:
                    value = value.copy()  # JAX buffers are read-only views
            arrays[name] = value
        if self.accepts_cache_key:
            return self.run(arrays, scalars, domain, origins, cache_key=cache_key)
        return self.run(arrays, scalars, domain, origins)


class NativeResult:
    """A written result still in backend-native layout: the stencil runtime
    installs it on the Storage (native cache) instead of rebinding the
    public array, so chained calls skip layout conversion entirely."""

    __slots__ = ("key", "native", "decode")

    def __init__(self, key: Any, native: Any, decode):
        self.key = key
        self.native = native
        self.decode = decode
