"""JAX/XLA backend — the workhorse TPU backend.

Counterpart of the reference's compiled backends (``gt:cpu_*``/``gt:gpu``,
/root/reference/src/gt4py/cartesian/backend/gtcpp_backend.py): instead of
generating C++/CUDA and binding through pybind11, the lowered GTIR is traced
once per (domain, origins, shapes) specialization into a ``jax.jit``
function; XLA fuses the parallel statements and compiles K scans into native
TPU loops. Written fields are donated so updates happen in place in HBM.

The specialization cache mirrors the reference's ``CompiledProgramsPool``
design (next/otf/compiled_program.py:333): keyed by static call descriptors,
compiled on miss, reused on hit.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from gt4py_tpu.cartesian.backend.base import (
    Backend,
    chain_cycle_len,
    chain_dirty_roles,
    register,
)
from gt4py_tpu.cartesian.backend.evaluator import Evaluator
from gt4py_tpu.cartesian.definitions import AccessKind


@register
class JaxBackend(Backend):
    name = "jax"
    array_kind = "jax"
    storage_info = {"alignment": 128, "device": "tpu"}

    def __init__(self, analyzed, options):
        super().__init__(analyzed, options)
        self._cache: dict[Any, Any] = {}
        #: validation-cache-key -> executable (warm-path alias of _cache)
        self._fast_cache: dict[Any, Any] = {}
        self.written = [
            name
            for name, info in analyzed.field_infos.items()
            if info.access & AccessKind.WRITE
        ]

    def _build(self, domain, origins_key):
        import jax

        origins = dict(origins_key)
        analyzed = self.analyzed
        written = self.written

        def fn(written_arrays, read_arrays, scalars):
            arrays = {**read_arrays, **written_arrays}
            ev = Evaluator(analyzed, domain, origins, arrays, scalars, ns="jax")
            out = ev.run()
            return {n: out[n] for n in written}

        return jax.jit(fn, donate_argnums=(0,))

    def _build_nodonate(self, domain, origins_key):
        import jax

        origins = dict(origins_key)
        analyzed = self.analyzed
        written = self.written

        def fn(written_arrays, read_arrays, scalars):
            arrays = {**read_arrays, **written_arrays}
            ev = Evaluator(analyzed, domain, origins, arrays, scalars, ns="jax")
            out = ev.run()
            return {n: out[n] for n in written}

        return jax.jit(fn)

    accepts_cache_key = True

    def run(self, arrays, scalars, domain, origins, cache_key=None) -> dict[str, Any]:
        written_arrays = {n: arrays[n] for n in self.written if n in arrays}
        read_arrays = {n: a for n, a in arrays.items() if n not in written_arrays}
        # Aliased in/out storages (the reference's in-place RK idiom:
        # rk_stage(in_u_tmp=u, out_u=u)): donating the written buffer would
        # invalidate the aliased read argument — use a non-donating
        # executable for those calls. Reads still observe the ORIGINAL
        # values (functional arrays), matching reference numpy semantics.
        aliased = any(
            any(r is w for w in written_arrays.values())
            for r in read_arrays.values()
        )
        # Warm path: the runtime's identity-free validation key already
        # determines (domain, origins, shapes, dtypes) — skip rebuilding
        # the shapes key. The resolved-key cache below stays authoritative
        # so distinct user origin/domain spellings share one executable.
        fast_key = (cache_key, aliased) if cache_key is not None else None
        if fast_key is not None:
            fn = self._fast_cache.get(fast_key)
            if fn is not None:
                return fn(written_arrays, read_arrays, scalars)
        origins_key = tuple(sorted(origins.items()))
        shapes_key = tuple(
            (name, tuple(a.shape), np.dtype(a.dtype))
            for name, a in sorted(arrays.items())
        )
        key = (domain, origins_key, shapes_key, aliased)
        fn = self._cache.get(key)
        if fn is None:
            fn = (
                self._build_nodonate(domain, origins_key)
                if aliased
                else self._build(domain, origins_key)
            )
            self._cache[key] = fn
        if fast_key is not None:
            if len(self._fast_cache) >= 128:
                self._fast_cache.clear()
            self._fast_cache[fast_key] = fn
        return fn(written_arrays, read_arrays, scalars)

    def run_chained_from_infos(
        self, infos, scalars, domain, origins, n_steps, swap
    ):
        """On-device chained execution: the whole time loop runs inside ONE
        jitted ``fori_loop`` with buffer rotation between steps, so the
        per-call dispatch/validation overhead (the cost ``freeze()`` only
        reduces) amortizes to ~0 per step. The body is unrolled by the
        swap permutation's cycle length so each buffer returns to its own
        loop-carry slot (XLA keeps them in place instead of copying). The
        chain length is a traced argument — one executable serves every
        ``n_steps``."""
        import jax
        import jax.numpy as jnp
        from jax import lax

        arrays = {}
        for name, info in infos.items():
            v = info.array
            arrays[name] = jnp.asarray(v) if isinstance(v, np.ndarray) else v
        roles = sorted(arrays)
        dirty = chain_dirty_roles(self.analyzed, infos, swap)
        consts = [r for r in roles if r not in dirty]
        cycle = chain_cycle_len(roles, swap)
        written = [n for n in self.written if n in arrays]

        # Aliased buffers (same array passed for two roles): donation would
        # invalidate the aliased read — fall back to a non-donating runner.
        vals = list(arrays.values())
        aliased = any(
            vals[i] is vals[j]
            for i in range(len(vals))
            for j in range(i + 1, len(vals))
        )
        origins_key = tuple(sorted(origins.items()))
        shapes_key = tuple(
            (name, tuple(a.shape), np.dtype(a.dtype))
            for name, a in sorted(arrays.items())
        )
        key = (
            "chain",
            domain,
            origins_key,
            shapes_key,
            tuple(sorted(swap.items())),
            aliased,
        )
        runner = self._cache.get(key)
        if runner is None:
            step = self._build_nodonate(domain, origins_key)

            def one(state, const, sc):
                full = {**const, **state}
                w = {n: full[n] for n in written}
                r = {n: v for n, v in full.items() if n not in w}
                out = step(w, r, sc)
                after = {**full, **out}
                return {rr: after[swap.get(rr, rr)] for rr in state}

            def run(n, state, const, sc):
                def body_cycle(i, st):
                    for _ in range(cycle):
                        st = one(st, const, sc)
                    return st

                st = lax.fori_loop(0, n // cycle, body_cycle, state)
                return lax.fori_loop(
                    0, n % cycle, lambda i, st: one(st, const, sc), st
                )

            runner = jax.jit(run, donate_argnums=() if aliased else (1,))
            self._cache[key] = runner

        state = {r: arrays[r] for r in dirty}
        const = {r: arrays[r] for r in consts}
        out = runner(np.int32(n_steps), state, const, scalars)
        self.last_strategy = "xla"
        return dict(out)
