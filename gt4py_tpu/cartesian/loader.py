"""Build orchestration: definition function → StencilObject.

Counterpart of the reference's ``loader.py`` + ``StencilBuilder``
(/root/reference/src/gt4py/cartesian/loader.py:53, stencil_builder.py:27):
runs the frontend + analysis pipeline, instantiates the backend, and wraps
everything in a StencilObject. In-process memoization keyed by the stencil
fingerprint stands in for the reference's ``.gt_cache`` package tree — the
expensive compilation step (XLA) has its own persistent cache (caching.py).
"""

from __future__ import annotations

import time
from typing import Callable

from gt4py_tpu.cartesian import backend as backend_module
from gt4py_tpu.cartesian.caching import stencil_fingerprint
from gt4py_tpu.cartesian.passes import analyze
from gt4py_tpu.cartesian.stencil_object import StencilObject

_CACHE: dict[str, StencilObject] = {}


def load_stencil(definition: Callable, build_options: dict) -> StencilObject:
    build_info = build_options.get("build_info")
    start = time.perf_counter()

    fingerprint = stencil_fingerprint(definition, build_options)
    if not build_options.get("rebuild") and fingerprint in _CACHE:
        cached = _CACHE[fingerprint]
        if build_info is not None:
            build_info["load_time"] = time.perf_counter() - start
        return cached

    analyzed = analyze(definition, build_options)
    parse_done = time.perf_counter()

    backend_cls = backend_module.from_name(build_options["backend"])
    backend = backend_cls(analyzed, build_options)
    obj = StencilObject(analyzed, backend, build_options, definition)

    if build_info is not None:
        build_info["parse_time"] = parse_done - start
        build_info["module_time"] = time.perf_counter() - parse_done
        build_info["codegen_time"] = 0.0

    _CACHE[fingerprint] = obj
    return obj
