"""Pallas TPU backend (fused-kernel path).

Counterpart of the reference's ``gt:gpu`` CUDA backend
(/root/reference/src/gt4py/cartesian/backend/gtcpp_backend.py:169): the
stencil executes as pipelined Pallas plane kernels (pallas_codegen.py /
pallas_seq.py). Stencils using features the kernel generators do not cover
fall back to the XLA-traced path (jax_backend.py) transparently.

Layout-native chaining: when every field covers the full K range, the
backend keeps data in the kernels' padded (K, I, J) layout ACROSS stencil
calls via the storage native cache (storage/storage.py) — writes return
:class:`NativeResult` and the public (I, J, K) view decodes lazily on the
first host access. Back-to-back stencil calls on the same storages
therefore pay zero transpose/pad per call, like the reference's
generated extensions operating directly on backend-layout buffers.

Off-TPU (tests on the CPU mesh) kernels run in the Pallas interpreter.
"""

from __future__ import annotations

import warnings
from typing import Any

import numpy as np

from gt4py_tpu.cartesian.backend.base import (
    NativeResult,
    chain_cycle_len,
    chain_dirty_roles,
    register,
)
from gt4py_tpu.cartesian.backend.jax_backend import JaxBackend
from gt4py_tpu.cartesian.backend.pallas_codegen import (
    PallasUnsupported,
    build_pallas_fn,
)


_FALLBACK = object()


@register
class PallasBackend(JaxBackend):
    name = "tpu:pallas"
    array_kind = "jax"
    storage_info = {"alignment": 128, "device": "tpu"}

    def __init__(self, analyzed, options):
        super().__init__(analyzed, options)
        self._native_cache: dict[Any, Any] = {}
        #: validation-cache-key -> native entry (warm-path alias of
        #: _native_cache); bounded like JaxBackend._fast_cache so varying
        #: shapes/origins in long-running workloads cannot grow it forever.
        self._native_fast: dict[Any, Any] = {}
        #: kernel strategy that served the most recent call: "split",
        #: "plane", "staged", "tiled", or "xla" (fallback). Surfaced on
        #: ``exec_info["pallas_strategy"]`` so tests/users can assert the
        #: fast path actually ran (no silent fallback).
        self.last_strategy: str | None = None

    # -- fallback path (public-layout arrays, XLA or tiled kernel) ----------

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
            self.last_strategy = "xla"
            xla = super()._build(domain, origins_key)

            def xla_call(written_arrays, read_arrays, scalars):
                self.last_strategy = "xla"
                return xla(written_arrays, read_arrays, scalars)

            return xla_call

        written = self.written
        strategy = getattr(pallas_fn, "strategy", "pallas")

        def fn(written_arrays, read_arrays, scalars):
            arrays = {**read_arrays, **written_arrays}
            out = pallas_fn(arrays, scalars)
            return {n: out[n] for n in written}

        jfn = jax.jit(fn, donate_argnums=(0,))
        xla_fallback = None

        def call(written_arrays, read_arrays, scalars):
            # Some rejections depend on concrete array shapes and surface at
            # kernel trace time (first call per shape set), e.g. a J strip
            # wider than the split kernel carries — fall back transparently.
            nonlocal xla_fallback
            if xla_fallback is not None:
                self.last_strategy = "xla"
                return xla_fallback(written_arrays, read_arrays, scalars)
            try:
                result = jfn(written_arrays, read_arrays, scalars)
                self.last_strategy = strategy
                return result
            except PallasUnsupported as e:
                warnings.warn(
                    f"tpu:pallas falling back to XLA path for stencil "
                    f"'{self.analyzed.name}' (call-time): {e}",
                    stacklevel=2,
                )
                xla_fallback = super(PallasBackend, self)._build(domain, origins_key)
                self.last_strategy = "xla"
                return xla_fallback(written_arrays, read_arrays, scalars)

        return call

    # -- native-layout path ---------------------------------------------------

    def run_from_infos(self, infos, scalars, domain, origins, cache_key=None):
        # Warm path: the runtime's identity-free validation key determines
        # (domain, origins, shapes, dtypes) — skip rebuilding the native key.
        if cache_key is not None:
            entry = self._native_fast.get(cache_key)
        else:
            entry = None

        def resolved_key():
            return (
                domain,
                tuple(sorted(origins.items())),
                tuple(
                    (n, tuple(infos[n].shape), str(infos[n].dtype))
                    for n in sorted(infos)
                ),
            )

        if entry is None:
            key = resolved_key()
            entry = self._native_cache.get(key)
            if entry is None:
                entry = self._build_native(domain, origins, infos)
                self._native_cache[key] = entry
            if cache_key is not None:
                if len(self._native_fast) >= 128:
                    self._native_fast.clear()
                self._native_fast[cache_key] = entry
        if entry is _FALLBACK:
            # public-layout path (XLA or pallas via _build; _build records
            # the strategy)
            return super().run_from_infos(
                infos, scalars, domain, origins, cache_key=cache_key
            )
        result = entry(infos, scalars)
        if result is None:  # call-time PallasUnsupported inside the runner
            self._native_cache[resolved_key()] = _FALLBACK
            if cache_key is not None:
                self._native_fast[cache_key] = _FALLBACK
            return super().run_from_infos(
                infos, scalars, domain, origins, cache_key=cache_key
            )
        return result

    def _decoder_factory(self, layout, origins, domain):
        """Per-(name, shape) jitted native->public decoders, shared by the
        single-step native runner and the native chain. ONE jitted decoder
        per key: a fresh jax.jit per call would hit the (remote)
        compile-cache round trip on every lazy decode (~500 ms/call
        through the axon tunnel)."""
        import jax
        import jax.numpy as jnp

        _decoders: dict[Any, Any] = {}

        def make_decode(name: str, shape):
            key = (name, tuple(shape))
            dec = _decoders.get(key)
            if dec is None:
                ni, nj, nkf = shape
                if layout == "split":
                    oj = origins[name][1]
                    ndom = domain[1]

                    def decode(native):
                        main, strip = native
                        parts = []
                        if oj > 0:
                            parts.append(strip[:nkf, :ni, :oj])
                        parts.append(main[:nkf, :ni, :])
                        if nj > oj + ndom:
                            parts.append(strip[:nkf, :ni, oj : oj + nj - oj - ndom])
                        rows = (
                            jnp.concatenate(parts, axis=2)
                            if len(parts) > 1
                            else parts[0]
                        )
                        return jnp.transpose(rows, (1, 2, 0))
                else:

                    def decode(native):
                        # Full-K coverage: strip padding, back to (I, J, K).
                        return jnp.transpose(native[:nkf, :ni, :nj], (1, 2, 0))

                dec = _decoders[key] = jax.jit(decode)
            return dec

        return make_decode

    def _native_usable(self, pfn, domain, origins, infos):
        """Gates shared by the native single-step runner and the native
        chain: the cross-call native cache models plain full-K (I, J, K)
        buffers only."""
        if not hasattr(pfn, "call_padded"):
            return False
        nk = domain[2]
        tables = set(getattr(pfn, "tables", ()))
        for n in pfn.reads:
            if n in tables:
                continue
            finfo = self.analyzed.field_infos[n]
            if finfo.data_dims or finfo.domain_mask != (True, True, True):
                return False
            if origins[n][2] != 0 or infos[n].shape[2] != nk:
                return False
        return True

    def run_chained_from_infos(
        self, infos, scalars, domain, origins, n_steps, swap
    ):
        """Native-layout chained execution: encode once, run the whole
        time loop as one jitted ``fori_loop`` over padded (K, I, J)
        buffers with rotation between steps (the hand-rolled bench.py
        chaining, productized), decode lazily at the end. Falls back to
        the XLA chained path (JaxBackend) when the kernel generators
        decline the stencil."""
        import jax

        key = (
            "chain",
            domain,
            tuple(sorted(origins.items())),
            tuple(
                (n, tuple(infos[n].shape), str(infos[n].dtype))
                for n in sorted(infos)
            ),
            tuple(sorted(swap.items())),
        )
        entry = self._native_cache.get(key)
        if entry is None:
            entry = self._build_native_chain(domain, origins, infos, swap)
            self._native_cache[key] = entry
        if entry is _FALLBACK:
            return super().run_chained_from_infos(
                infos, scalars, domain, origins, n_steps, swap
            )
        result = entry(infos, scalars, n_steps)
        if result is None:  # call-time PallasUnsupported inside the runner
            self._native_cache[key] = _FALLBACK
            return super().run_chained_from_infos(
                infos, scalars, domain, origins, n_steps, swap
            )
        return result

    def _build_native_chain(self, domain, origins, infos, swap):
        import functools

        import jax
        import jax.numpy as jnp
        from jax import lax

        from gt4py_tpu.storage.storage import Storage

        interpret = jax.default_backend() != "tpu"
        try:
            pfn = build_pallas_fn(self.analyzed, domain, origins, interpret=interpret)
        except PallasUnsupported:
            return _FALLBACK
        if not self._native_usable(pfn, domain, origins, infos):
            return _FALLBACK

        nk = domain[2]
        layout = getattr(pfn, "layout", "kij")
        writes = set(pfn.writes)
        roles = sorted(pfn.reads)
        dirty = chain_dirty_roles(self.analyzed, infos, swap)
        dirty = [r for r in dirty if r in roles]
        consts = [r for r in roles if r not in dirty]
        cycle = chain_cycle_len(roles, swap)
        unseeded = getattr(pfn, "unseeded", frozenset())
        ndom_i, ndom_j, ndom_k = domain

        encoders = {
            n: jax.jit(functools.partial(lambda _n, a: pfn.encode(_n, a), n))
            for n in pfn.reads
        }
        make_decode = self._decoder_factory(layout, origins, domain)

        needs_paste = {
            n: any(
                s > d
                for s, d in zip(infos[n].shape, (ndom_i, ndom_j, ndom_k))
            )
            for n in unseeded
            if n in infos
        }

        def one(state, const, sc):
            full = {**const, **state}
            out = pfn.call_padded(full, sc)
            for n in unseeded:
                if n in full and needs_paste.get(n):
                    oi, oj, _ = origins.get(n, (0, 0, 0))
                    sl = (
                        slice(0, ndom_k),
                        slice(oi, oi + ndom_i),
                        slice(oj, oj + ndom_j),
                    )
                    out[n] = full[n].at[sl].set(out[n][sl])
            after = {**full, **out}
            return {r: after[swap.get(r, r)] for r in state}

        def run(n, state, const, sc):
            def body_cycle(i, st):
                for _ in range(cycle):
                    st = one(st, const, sc)
                return st

            st = lax.fori_loop(0, n // cycle, body_cycle, state)
            return lax.fori_loop(0, n % cycle, lambda i, st: one(st, const, sc), st)

        import os as _os

        _donate = _os.environ.get("GT4PY_PALLAS_DONATE", "0") == "1"
        jit_run = jax.jit(run, donate_argnums=(1,) if _donate else ())

        def runner(infos, scalars, n_steps):
            natives = {}
            for n in roles:
                info = infos[n]
                orig = info.original
                nkey = (layout, nk, tuple(info.shape))
                nat = orig.native_get(nkey) if isinstance(orig, Storage) else None
                if nat is None:
                    nat = encoders[n](jnp.asarray(info.array))
                    if isinstance(orig, Storage) and n not in writes and n not in dirty:
                        orig.native_set(
                            nkey, nat, make_decode(n, info.shape), stale_public=False
                        )
                natives[n] = nat
            state = {r: natives[r] for r in dirty}
            const = {r: natives[r] for r in consts}
            out = jit_run(np.int32(n_steps), state, const, scalars)
            self.last_strategy = getattr(pfn, "strategy", "pallas")
            results = {}
            for n in dirty:
                info = infos[n]
                if isinstance(info.original, Storage):
                    results[n] = NativeResult(
                        (layout, nk, tuple(info.shape)),
                        out[n],
                        make_decode(n, info.shape),
                    )
                else:
                    results[n] = pfn.decode(n, out[n], jnp.asarray(info.array))
            return results

        def guarded(infos, scalars, n_steps):
            try:
                return runner(infos, scalars, n_steps)
            except PallasUnsupported:
                return None

        return guarded

    def _build_native(self, domain, origins, infos):
        import jax

        from gt4py_tpu.storage.storage import Storage

        interpret = jax.default_backend() != "tpu"
        try:
            pfn = build_pallas_fn(self.analyzed, domain, origins, interpret=interpret)
        except PallasUnsupported:
            return _FALLBACK
        # Native chaining needs plain full-K (I, J, K) buffers (tiled
        # strategy has no native-layout API; GlobalTables pass through).
        if not self._native_usable(pfn, domain, origins, infos):
            return _FALLBACK
        nk = domain[2]

        import functools

        import jax.numpy as jnp

        writes = set(pfn.writes)
        layout = getattr(pfn, "layout", "kij")
        encoders = {
            n: jax.jit(functools.partial(lambda _n, a: pfn.encode(_n, a), n))
            for n in pfn.reads
        }

        make_decode = self._decoder_factory(layout, origins, domain)

        # Seed-skipped outputs (write-only, full coverage) come back with
        # undefined content OUTSIDE the compute domain. When the public
        # array carries halo (shape exceeds the domain), the chained
        # native must stay halo-correct: paste the fresh domain region
        # onto the previous (halo-correct) native. No-halo arrays skip
        # this — only invisible padding is undefined there.
        unseeded = getattr(pfn, "unseeded", frozenset())
        ndom_i, ndom_j, ndom_k = domain

        def step(written_nat, read_nat, sc):
            out = pfn.call_padded({**read_nat, **written_nat}, sc)
            for n in unseeded:
                if n in written_nat and _needs_halo_paste[n]:
                    # Domain region in native (K, I, J) coordinates: K rows
                    # start at the K origin (encode slices them off); I/J
                    # rows keep the public layout, so the origin offsets.
                    oi, oj, _ = origins.get(n, (0, 0, 0))
                    sl = (
                        slice(0, ndom_k),
                        slice(oi, oi + ndom_i),
                        slice(oj, oj + ndom_j),
                    )
                    out[n] = written_nat[n].at[sl].set(out[n][sl])
            return out

        _needs_halo_paste: dict = {}

        import os as _os

        # Donating the written natives makes the remote Mosaic compiler
        # crash at production sizes (same opaque failure family as the x64
        # trace context); default off — XLA inserts one defensive copy per
        # written field instead. GT4PY_PALLAS_DONATE=1 re-enables.
        _donate = _os.environ.get("GT4PY_PALLAS_DONATE", "0") == "1"
        jit_step = jax.jit(step, donate_argnums=(0,) if _donate else ())

        strategy = getattr(pfn, "strategy", "pallas")

        def runner(infos, scalars):
            self.last_strategy = strategy
            for n in unseeded:
                if n in infos:
                    _needs_halo_paste[n] = any(
                        s > d
                        for s, d in zip(
                            infos[n].shape, (ndom_i, ndom_j, ndom_k)
                        )
                    )
            natives = {}
            for n in pfn.reads:
                info = infos[n]
                orig = info.original
                nkey = (layout, nk, tuple(info.shape))
                nat = orig.native_get(nkey) if isinstance(orig, Storage) else None
                if nat is None:
                    nat = encoders[n](jnp.asarray(info.array))
                    if isinstance(orig, Storage) and n not in writes:
                        # Read-only: cache the encoding, public view stays valid.
                        orig.native_set(
                            nkey, nat, make_decode(n, info.shape), stale_public=False
                        )
                natives[n] = nat
            written_nat = {n: natives[n] for n in pfn.writes}
            read_nat = {n: v for n, v in natives.items() if n not in writes}
            out = jit_step(written_nat, read_nat, scalars)
            results = {}
            for n in pfn.writes:
                info = infos[n]
                if isinstance(info.original, Storage):
                    results[n] = NativeResult(
                        (layout, nk, tuple(info.shape)),
                        out[n],
                        make_decode(n, info.shape),
                    )
                else:
                    results[n] = pfn.decode(n, out[n], jnp.asarray(info.array))
            return results

        def guarded(infos, scalars):
            # Shape-dependent rejections surface at kernel trace time (first
            # call per shape set): fall back to the public-layout path.
            try:
                return runner(infos, scalars)
            except PallasUnsupported:
                return None

        return guarded
