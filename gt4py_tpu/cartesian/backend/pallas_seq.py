"""Sequential (staged) plane strategy: pipelined K-plane kernels for
FORWARD/BACKWARD vertical loops.

This covers the reference's sequential-K execution class — tridiagonal
solves and the vertical-advection dycore (reference
tests/cartesian_tests/.../stencil_definitions.py:220,236; the gtfn backend
compiles these to `ScanExecution` C++, codegens/gtfn/codegen.py:181-208) —
with a TPU-native schedule:

- every vertical loop becomes ONE ``pallas_call`` whose grid walks the
  loop's K range IN ORDER (``dimension_semantics=("arbitrary",)``); for
  BACKWARD loops the BlockSpec index maps reverse the walk, so Pallas'
  automatic pipeline still double-buffers plane DMA against compute in
  both directions,
- each grid step processes one (1, I, J) plane held fully in VMEM,
- reads of already-updated values at K offsets (the tridiagonal
  ``dcol[0, 0, -1]`` pattern) come from VMEM carry planes that persist
  across grid steps (the reference's K-cache role,
  gtc/passes/oir_optimizations/caches.py:92); rings of depth > 1 rotate,
- reads of original values at K offsets (``wcon[1, 0, 1]``-style) come
  from extra input BlockSpecs whose index maps shift (and clamp) the
  plane index — no halo DMA logic needed,
- interval sections predicate on the scalar plane index with ``pl.when``,
- multi-loop stencils run one call per loop ("stages"); temporaries
  crossing stage boundaries materialize as (K, I, J) HBM buffers, while
  loop-local temporaries stay in VMEM values/carries.

PARALLEL loops inside staged stencils (and pure-PARALLEL stencils with
static K offsets, e.g. 3-D Laplacians) use the same kernel with all
sections active and no carries.

Shares expression evaluation (CSE, masks, native functions) with
``pallas_codegen._BlockEvaluator``.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from gt4py_tpu import eve
from gt4py_tpu.cartesian import gtir
from gt4py_tpu.cartesian.definitions import AccessKind, Extent
from gt4py_tpu.cartesian.passes.extents import iter_writes
from gt4py_tpu.cartesian.passes.pipeline import AnalyzedStencil

from gt4py_tpu.cartesian.backend.pallas_codegen import (
    PallasUnsupported,
    _BlockEvaluator,
    _LANE,
    _SUBLANE,
    _round_up,
)


def staged_eligible(analyzed: AnalyzedStencil, *, interpret: bool) -> bool:
    """True when every construct maps onto the staged plane kernels."""
    if not interpret:
        for p in analyzed.stencil.params:
            dtype = getattr(p, "dtype", None)
            if dtype is not None and np.dtype(dtype).itemsize == 8:
                return False
        for t in analyzed.stencil.temporaries:
            if t.dtype is not None and np.dtype(t.dtype).itemsize == 8:
                return False
    datadim_reads: set[str] = set()
    for p in analyzed.stencil.params:
        if isinstance(p, gtir.GlobalTableDecl):
            return False
        if isinstance(p, gtir.FieldDecl) and (
            p.data_dims or p.dimensions != (True, True, True)
        ):
            # Lower-dim / data-dim fields ride as READ-only streams
            # (broadcast planes / one stream per flat data index); writes
            # to them have no reduced output stream here.
            info = analyzed.field_infos.get(p.name)
            if info is None or info.access & AccessKind.WRITE:
                return False
            if p.data_dims:
                from gt4py_tpu.cartesian.backend.pallas_codegen import (
                    _MAX_DATA_STREAMS,
                )

                if int(np.prod(p.data_dims)) > _MAX_DATA_STREAMS:
                    return False
                datadim_reads.add(p.name)
    for t in analyzed.stencil.temporaries:
        if t.data_dims:
            return False
    for _, _, stmt in analyzed.stencil.walk_stmts():
        if isinstance(stmt, gtir.While):
            return False
        for node in eve.walk_values(stmt):
            if isinstance(node, gtir.FieldAccess):
                if node.koffset is not None or node.abs_k is not None:
                    return False
                if node.data_index and node.name not in datadim_reads:
                    return False
    # Out-of-domain K reads (nonzero post-clipping K extents) are handled
    # in build_staged_fn, where origins distinguish genuine K-halo storage
    # (tiled strategy territory) from halo-less fields whose edge reads
    # clamp — the debug/evaluator/plane-scan semantics.
    # PARALLEL write-then-K-offset-read: reference statement-stage semantics
    # (permitted by the race pass) require the read to observe the UPDATED
    # value, but the staged classification would serve it from the shifted
    # original input stream. The tiled/XLA paths handle this via
    # extended-extent recompute — fall back.
    for vl in analyzed.stencil.vertical_loops:
        if vl.loop_order != gtir.LoopOrder.PARALLEL:
            continue
        written = {
            w.name
            for sec in vl.sections
            for stmt in sec.body
            for w in iter_writes(stmt)
        }
        for sec in vl.sections:
            for stmt in sec.body:
                for node in eve.walk_values(stmt):
                    if (
                        isinstance(node, gtir.FieldAccess)
                        and node.offset[2] != 0
                        and node.name in written
                    ):
                        return False
    return True


class _Stage:
    """One vertical loop compiled to one pallas_call."""

    def __init__(self, analyzed: AnalyzedStencil, vloop: gtir.VerticalLoop, nk: int):
        self.analyzed = analyzed
        self.vloop = vloop
        self.order = vloop.loop_order
        self.backward = vloop.loop_order == gtir.LoopOrder.BACKWARD
        self.sections = []
        ks_all, ke_all = nk, 0
        for sec in vloop.sections:
            ks, ke = sec.interval.resolve(nk)
            if ke > ks:
                self.sections.append((ks, ke, sec))
                ks_all = min(ks_all, ks)
                ke_all = max(ke_all, ke)
        self.k_start, self.k_end = (ks_all, ke_all) if self.sections else (0, 0)

        # Names written in this loop (fields and temps).
        self.written: set[str] = set()
        for _, _, sec in self.sections:
            for stmt in sec.body:
                for w in iter_writes(stmt):
                    self.written.add(w.name)
        # Reads classified per (name, dk):
        #   updated: value written this loop, observed at an
        #            already-visited plane -> carry
        #   original: anything else -> shifted input spec
        self.carry_reads: set[tuple[str, int]] = set()
        self.orig_reads: set[tuple[str, int]] = set()
        # Carry names whose ring is read before |dk| rotations have happened
        # (the read's section starts within |dk| steps of the walk's first
        # plane): those ring slots must be seeded from the current buffer
        # content (planes preceding the walk, written by earlier stages or
        # original input) at grid step 0.
        self.needs_seed: set[str] = set()
        seq = self.order != gtir.LoopOrder.PARALLEL
        for ks, ke, sec in self.sections:
            for stmt in sec.body:
                for node in eve.walk_values(stmt):
                    if not isinstance(node, gtir.FieldAccess):
                        continue
                    dk = node.offset[2]
                    name = node.name
                    updated_dir = dk < 0 if not self.backward else dk > 0
                    if name in self.written:
                        if dk == 0:
                            continue  # in-step value
                        if seq and updated_dir:
                            self.carry_reads.add((name, dk))
                            first_gap = (
                                (self.k_end - ke) if self.backward else (ks - self.k_start)
                            )
                            if first_gap < abs(dk):
                                self.needs_seed.add(name)
                        else:
                            self.orig_reads.add((name, dk))
                    else:
                        self.orig_reads.add((name, dk))
        if self.order == gtir.LoopOrder.PARALLEL and self.carry_reads:
            raise PallasUnsupported("parallel loop with carry reads")
        # Carry depth per name.
        self.carry_depth: dict[str, int] = {}
        for name, dk in self.carry_reads:
            self.carry_depth[name] = max(self.carry_depth.get(name, 0), abs(dk))


class _StagedGeometry:
    """Padded (K, I, J) buffer geometry shared by all stages."""

    def __init__(self, analyzed: AnalyzedStencil, domain, origins):
        self.analyzed = analyzed
        self.domain = domain
        self.origins = dict(origins)
        ni, nj, nk = domain
        self.nk = nk
        self.field_ext: dict[str, Extent] = {}
        self.fields: list[str] = []
        #: (has_I, has_J, has_K) per field; missing axes broadcast on read
        self.axes_mask: dict[str, tuple[bool, bool, bool]] = {}
        #: flattened data-dimension stream count (0 = plain scalar field)
        self.data_n: dict[str, int] = {}
        self.data_shape: dict[str, tuple[int, ...]] = {}
        for name, info in analyzed.field_infos.items():
            if info.access == AccessKind.NONE:
                continue
            self.field_ext[name] = analyzed.field_extents.get(name, Extent.zeros())
            self.fields.append(name)
            self.axes_mask[name] = info.domain_mask
            if info.data_dims:
                self.data_n[name] = int(np.prod(info.data_dims))
                self.data_shape[name] = tuple(info.data_dims)
        self.temps = {t.name: t for t in analyzed.stencil.temporaries}
        for t in analyzed.stencil.temporaries:
            self.field_ext[t.name] = analyzed.field_extents.get(t.name, Extent.zeros())
        # Temp plane sizes (padded so all stages agree).
        self.temp_shape: dict[str, tuple[int, int]] = {}
        for name in self.temps:
            ext = self.field_ext[name]
            self.temp_shape[name] = (
                _round_up(ni + ext.i[1] - ext.i[0], _SUBLANE),
                _round_up(nj + ext.j[1] - ext.j[0], _LANE),
            )
        self.dtypes = {
            n: (
                analyzed.field_infos[n].dtype
                if n in analyzed.field_infos
                else (self.temps[n].dtype or np.float64)
            )
            for n in self.field_ext
        }


def build_staged_fn(
    analyzed: AnalyzedStencil,
    domain: tuple[int, int, int],
    origins: dict[str, tuple[int, int, int]],
    *,
    interpret: bool = False,
    fuse: Optional[bool] = None,
):
    """Build fn(arrays: dict[name -> (I, J, K)], scalars) -> written arrays,
    executing the stencil as a chain of per-vertical-loop plane kernels."""
    import jax
    import jax.numpy as jnp

    if not staged_eligible(analyzed, interpret=interpret):
        raise PallasUnsupported("staged plane strategy: unsupported construct")

    ni, nj, nk = domain
    # Reads whose K index escapes the compute domain clamp to the boundary
    # plane (spec index maps / encode row-dropping). That equals the other
    # backends' semantics only for fields WITHOUT K-halo storage; fields
    # with a K origin carry real halo data the clamp would shadow, and a
    # clamped read of a WRITTEN field would observe partial results.
    from gt4py_tpu.cartesian.definitions import AccessKind as _AK

    for name, ext in analyzed.field_extents.items():
        if ext.k == (0, 0):
            continue
        info = analyzed.field_infos.get(name)
        if info is not None and info.access & _AK.WRITE:
            raise PallasUnsupported(
                f"out-of-domain K read of written field '{name}'"
            )
        if origins.get(name, (0, 0, 0))[2] != 0:
            raise PallasUnsupported(f"K-halo'd field '{name}' (nonzero K origin)")
    geo = _StagedGeometry(analyzed, domain, origins)
    stages = [_Stage(analyzed, vl, nk) for vl in analyzed.stencil.vertical_loops]
    stages = [s for s in stages if s.sections]

    # Temporaries crossing stage boundaries become HBM buffers.
    temp_writer: dict[str, int] = {}
    cross_temps: set[str] = set()
    for idx, stage in enumerate(stages):
        for _, _, sec in stage.sections:
            for stmt in sec.body:
                for node in eve.walk_values(stmt):
                    if isinstance(node, gtir.FieldAccess) and node.name in geo.temps:
                        w = temp_writer.get(node.name)
                        if w is not None and w != idx:
                            cross_temps.add(node.name)
                for w in iter_writes(stmt):
                    if w.name in geo.temps:
                        temp_writer.setdefault(w.name, idx)
                        if temp_writer[w.name] != idx:
                            cross_temps.add(w.name)

    scalar_names = [
        n for n, i in analyzed.parameter_infos.items() if i.access != AccessKind.NONE
    ]

    # Fusion (EXPERIMENTAL, off by default): when cross-stage values fit in
    # VMEM scratch, all loops run in ONE pallas_call and the cross-stage
    # HBM round trip disappears. Measured SLOWER on vadv (407us fused vs
    # 182us per-stage at 256x256x80/v5e): the pipeline does not elide the
    # foreign-phase operand streams, so every spec is fetched on every
    # step of every phase. Enable with GT4PY_PALLAS_FUSE_STAGES=1 to
    # re-evaluate on future toolchains.
    if fuse is None:
        import os as _os

        fuse = _os.environ.get("GT4PY_PALLAS_FUSE_STAGES", "0") not in ("0", "", "false")
    fused = None
    has_nonplain = any(
        geo.axes_mask.get(n) not in (None, (True, True, True))
        or geo.data_n.get(n, 0)
        for n in geo.fields
    )
    if fuse and has_nonplain:
        fuse = False  # fused scratch model assumes plain (K, I, J) buffers
    if fuse and len(stages) >= 2:
        cross = _cross_names(geo, stages)
        if cross is not None and _fuse_scratch_bytes(geo, cross) <= _FUSE_SCRATCH_BUDGET:
            try:
                fused = _build_fused_call(
                    geo, stages, cross, scalar_names, interpret=interpret
                )
            except PallasUnsupported:
                fused = None

    if fused is not None:
        stage_calls = [fused]
        cross_temps = set()  # cross values live in VMEM scratch, not HBM
    else:
        stage_calls = [
            _build_stage_call(
                geo, stage, cross_temps, scalar_names,
                interpret=interpret, all_stages=stages,
            )
            for stage in stages
        ]

    def encode(n: str, a: Any) -> Any:
        """Public array -> padded (K, I, J) buffer; lower-dim fields keep
        size-1 axes; data-dim fields stack to (D, K, I, J) (one stream per
        flat index)."""
        bi, bj, bk = geo.axes_mask.get(n, (True, True, True))
        nd = len(geo.data_shape.get(n, ()))
        a = jnp.asarray(a)
        pos = 0
        for present in (bi, bj, bk):
            if not present:
                a = jnp.expand_dims(a, pos)
            pos += 1
        if nd:
            dd = tuple(range(3, 3 + nd))
            a = jnp.transpose(a, dd + (2, 0, 1))
            a = a.reshape((geo.data_n[n],) + a.shape[nd:])
        else:
            a = jnp.transpose(a, (2, 0, 1))[None]
        ok = origins[n][2] if bk else 0
        rows = a[:, ok : ok + min(nk, a.shape[1] - ok)] if bk else a[:, :1]
        pk = (nk - rows.shape[1]) if bk else 0
        pi = _round_up(rows.shape[2], _SUBLANE) - rows.shape[2] if bi else 0
        pj = _round_up(rows.shape[3], _LANE) - rows.shape[3] if bj else 0
        rows = jnp.pad(rows, ((0, 0), (0, pk), (0, pi), (0, pj)))
        return rows if nd else rows[0]

    # Fields that skip their seed stream (write-only, fully covered) carry
    # garbage OUTSIDE the compute domain in the kernel result; decode
    # pastes only the domain region back onto the original.
    unseeded_fields = {
        name
        for stage in stages
        for name in stage.written
        if _seed_skippable(analyzed, stages, stage, name, nk, origins)
    }

    def decode(n: str, r: Any, original: Any) -> Any:
        kf = jnp.transpose(original, (2, 0, 1))
        ok = origins[n][2]
        nk_eff = min(nk, kf.shape[0] - ok)
        if n in unseeded_fields:
            oi, oj = origins[n][0], origins[n][1]
            block = r[:nk_eff, oi : oi + ni, oj : oj + nj]
            kf = jnp.asarray(kf).at[
                ok : ok + nk_eff, oi : oi + ni, oj : oj + nj
            ].set(block)
            return jnp.transpose(kf, (1, 2, 0))
        rows = r[:nk_eff, : kf.shape[1], : kf.shape[2]]
        if ok > 0 or ok + rows.shape[0] < kf.shape[0]:
            rows = jnp.concatenate([kf[:ok], rows, kf[ok + rows.shape[0] :]], axis=0)
        return jnp.transpose(rows, (1, 2, 0))

    written_fields = [
        n
        for n, info in analyzed.field_infos.items()
        if info.access & AccessKind.WRITE
    ]

    def call_padded(padded: dict[str, Any], scalars: dict[str, Any]) -> dict[str, Any]:
        state = dict(padded)
        for t in cross_temps:
            si, sj = geo.temp_shape[t]
            state[t] = jnp.zeros((nk, si, sj), geo.dtypes[t])
        for call in stage_calls:
            state.update(call(state, scalars))
        return {n: state[n] for n in written_fields}

    # Out-of-domain K reads clamp to the boundary plane; that is only
    # faithful when the array has NO K rows beyond the domain (encode drops
    # trailing rows, so a high-side K halo would be silently shadowed —
    # the build-time guard covers the low side via origins, the high side
    # is shape-dependent and checked per call here).
    k_ext_reads = {
        name
        for name, ext in analyzed.field_extents.items()
        if ext.k != (0, 0) and name in analyzed.field_infos
    }

    def _check_k_halo(arrays) -> None:
        for name in k_ext_reads:
            bk = geo.axes_mask.get(name, (True, True, True))[2]
            if not bk:
                continue
            kax = sum(geo.axes_mask.get(name, (True, True, True))[:2])
            if arrays[name].shape[kax] - origins[name][2] > nk:
                raise PallasUnsupported(
                    f"field '{name}' carries a high-side K halo its "
                    f"out-of-domain reads would shadow"
                )

    def fn(arrays: dict[str, Any], scalars: dict[str, Any]) -> dict[str, Any]:
        _check_k_halo(arrays)
        padded = {n: encode(n, arrays[n]) for n in geo.fields}
        results = call_padded(padded, scalars)
        return {n: decode(n, results[n], arrays[n]) for n in written_fields}

    # -- chain-major J-split stepping --------------------------------------
    # Working sets beyond VMEM (vadv at 256x256x80: 7 x 21 MB buffers vs
    # 128 MB v5e VMEM) force XLA to leave ~2 operands in HBM, and the
    # per-step HBM streams dominate (profiled: forward stage 113 us of a
    # 129 us step). When NO stage reads at a J offset (and no horizontal
    # region masks exist), the J axis decouples completely — so an
    # n-step chain can run the FULL chain on each J part sequentially
    # ("chain-major"): per-part working sets halve and fit VMEM, and the
    # result is bit-identical to chaining unsplit steps. Parts must keep
    # lane alignment (J multiple of 128 per part).
    _j_split_legal = (
        all(ext.j == (0, 0) for ext in geo.field_ext.values())
        and all(origins.get(nm, (0, 0, 0))[1] == 0 for nm in geo.fields)
        and not any(
            getattr(stmt, "horizontal_masks", None)
            for _, _, stmt in analyzed.stencil.walk_stmts()
        )
    )
    _part_fns: dict[int, Any] = {}

    def chain_padded(
        padded: dict[str, Any],
        scalars: dict[str, Any],
        n,
        *,
        j_split: Optional[int] = None,
        carry_map: Optional[dict[str, str]] = None,
    ) -> dict[str, Any]:
        """Run ``n`` chained steps on padded buffers entirely on device:
        every written field feeds back into the next step, plus any
        renaming feedbacks in ``carry_map`` ({input_slot: written_field},
        e.g. a tridiagonal solve stepping ``{"rhs": "out"}``). With
        ``j_split=P`` (auto-chosen when None), buffers split into P
        lane-aligned J parts and each part runs its full n-step chain
        before the next starts, keeping per-part working sets
        VMEM-resident. Returns the written buffers after n steps."""
        from jax import lax

        import os as _os1

        if j_split is None:
            budget = int(
                _os1.environ.get("GT4PY_PALLAS_CHAIN_SPLIT_MB", "110")
            ) * 1024 * 1024
            nbytes = sum(
                int(np.prod(padded[nm].shape))
                * np.dtype(geo.dtypes[nm]).itemsize
                for nm in geo.fields
                if padded[nm].ndim >= 3 and padded[nm].shape[-1] > 1
            )
            nbytes += sum(
                nk * si * sj * np.dtype(geo.dtypes[t]).itemsize
                for t, (si, sj) in geo.temp_shape.items()
                if t in cross_temps
            )
            j_split = 1
            while (
                nbytes / j_split > budget
                and _j_split_legal
                and (nj // (2 * j_split)) % _LANE == 0
                and j_split < 8
            ):
                j_split *= 2
        if j_split > 1 and not _j_split_legal:
            raise PallasUnsupported("chain j_split: stencil has J coupling")
        chain_padded.last_j_split = j_split  # bench ceiling introspection

        def one_chain(call, state0):
            carry0 = {f: state0[f] for f in written_fields}
            if carry_map:
                # First step must consume the caller's dst value; later
                # steps consume the previous step's src output.
                for dst, src in carry_map.items():
                    carry0[src] = state0[dst]

            def body(i, carry):
                st = dict(state0)
                st.update(carry)
                if carry_map:
                    for dst, src in carry_map.items():
                        st[dst] = carry[src]
                return call(st, scalars)

            return lax.fori_loop(0, n, body, carry0)

        if j_split <= 1:
            return one_chain(call_padded, dict(padded))

        part = _part_fns.get(j_split)
        if part is None:
            part = build_staged_fn(
                analyzed, (ni, nj // j_split, nk), origins, interpret=interpret
            )
            _part_fns[j_split] = part
        w_dom = nj // j_split
        outs: list[dict[str, Any]] = []
        for p in range(j_split):
            state_p = {}
            for nm in geo.fields:
                buf = padded[nm]
                if buf.ndim >= 3 and buf.shape[-1] > 1:
                    state_p[nm] = buf[..., p * w_dom : (p + 1) * w_dom]
                else:
                    state_p[nm] = buf
            outs.append(one_chain(part.call_padded, state_p))
        result = {}
        for f in written_fields:
            out_f = jnp.concatenate([o[f] for o in outs], axis=-1)
            orig = padded[f]
            if orig.shape[-1] > nj:
                # preserve trailing pad/halo rows of the original buffer
                out_f = jnp.concatenate([out_f, orig[..., nj:]], axis=-1)
            result[f] = out_f
        return result

    fn.encode = encode
    fn.decode = decode
    fn.call_padded = call_padded
    fn.chain_padded = chain_padded
    #: [(in_streams, out_streams, k_steps)] per stage — per-step pipeline
    #: block-copy counts for the bench chain-major copy-roofline model
    fn.stage_streams = [
        (
            getattr(c, "n_in_streams", 0),
            getattr(c, "n_out_streams", 0),
            getattr(c, "n_steps", 0),
        )
        for c in stage_calls
    ]
    fn.reads = tuple(geo.fields)
    fn.writes = tuple(written_fields)
    fn.strategy = "staged"
    #: written fields whose kernel result is undefined OUTSIDE the compute
    #: domain (their seed stream was skipped) — consumers that retain the
    #: padded buffer (native-layout chaining) must paste the domain region
    #: onto halo-correct content when the public array carries halo.
    fn.unseeded = frozenset(unseeded_fields)
    return fn


def _seed_skippable(analyzed, stages, stage, name: str, nk: int, origins) -> bool:
    """Whether a written buffer can skip its dk=0 seed stream in ``stage``:
    a full-3D API field that is never read as an ORIGINAL value (carry
    reads of its own just-written planes are fine — they come from VMEM
    rings, not the seed) and whose unmasked plain writes cover the stage
    walk never consumes the seed — the copy would be a genuinely extra
    HBM read (bridged vadv with a separate out field: 7 streams vs 6,
    220us vs 188us measured; tridiag's backward solve reads x only
    through its carry). Everything else keeps the seed (it preserves
    non-domain points through the full-block write-back; decode pastes
    only the domain region for unseeded fields)."""
    info = analyzed.field_infos.get(name)
    if info is None:
        return False
    if info.axes != ("I", "J", "K") or info.data_dims:
        return False
    # I/J halo is fine — the decode paste and the backend's native-chain
    # paste restore it from halo-correct content. K origins interact with
    # encode's K-row slicing; keep those seeded.
    if origins.get(name, (0, 0, 0))[2] != 0:
        return False
    writer_idx = stages.index(stage)
    for si, s2 in enumerate(stages):
        if any(n == name for n, _ in s2.orig_reads):
            # Original reads in stages ordered BEFORE the writer consume
            # the pre-write buffer from the threaded state — safe. The
            # writer itself or any later stage observing the original
            # value needs the seed (bench vadv: utens_stage is read in
            # the FORWARD stage and overwritten in BACKWARD; skipping
            # the backward seed drops one block-copy stream per plane).
            if si >= writer_idx:
                return False
        if name in s2.needs_seed:
            return False
    # The walk must span the WHOLE buffer: grid steps only visit
    # [k_start, k_end) — planes outside an incomplete walk keep their
    # content through the input-output alias, which skipping removes.
    if stage.k_start != 0 or stage.k_end != nk:
        return False
    covered: list[tuple[int, int]] = []
    for ks, ke, sec in stage.sections:
        if any(
            isinstance(st, gtir.Assign)
            and st.target.name == name
            and st.mask is None
            and not st.horizontal_masks
            and st.target.koffset is None
            and st.target.abs_k is None
            for st in sec.body
        ):
            covered.append((ks, ke))
    covered.sort()
    pos = stage.k_start
    for ks, ke in covered:
        if ks > pos:
            return False
        pos = max(pos, ke)
    return pos >= stage.k_end


def _temp_seed_skippable(
    stages: "list[_Stage]", stage: "_Stage", name: str, nk: int
) -> bool:
    """Whether a cross-stage temporary can skip its dk=0 seed stream in
    its writer ``stage``: the buffer starts undefined (no zeros
    materialization, no input alias), so every plane ANY consumer can
    observe must be unconditionally written first.

    Checks:
    - written in exactly one stage (multi-writer temps must preserve the
      other stage's content through seeding),
    - within the writer stage, no section reads the temp at dk=0 before
      its first unconditional write (such reads consume the seed), and
      no original-value K-offset reads (non-carry) exist,
    - every other stage's read planes ``clamp([ks+dk, ke-1+dk])`` fall
      inside the union of intervals with unconditional unmasked plain
      writes, and no stage ordered BEFORE the writer reads it.
    """
    for s2 in stages:
        if s2 is not stage and name in s2.written:
            return False
    covered: list[tuple[int, int]] = []
    for ks, ke, sec in stage.sections:
        if any(
            isinstance(st, gtir.Assign)
            and st.target.name == name
            and st.mask is None
            and not st.horizontal_masks
            and st.target.koffset is None
            and st.target.abs_k is None
            for st in sec.body
        ):
            covered.append((ks, ke))
    if not covered:
        return False
    covered.sort()
    merged = [covered[0]]
    for ks, ke in covered[1:]:
        if ks <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], ke))
        else:
            merged.append((ks, ke))

    def is_covered(lo: int, hi: int) -> bool:
        return any(lo >= ks and hi <= ke - 1 for ks, ke in merged)

    writer_idx = stages.index(stage)
    for si, s2 in enumerate(stages):
        for ks, ke, sec in s2.sections:
            if s2 is stage:
                # Statement-order check: a dk=0 read before the section's
                # first unconditional write would consume the seed.
                written_yet = False
                for st in sec.body:
                    for node in eve.walk_values(st):
                        if (
                            isinstance(node, gtir.FieldAccess)
                            and node.name == name
                            and node is not getattr(st, "target", None)
                        ):
                            dk = node.offset[2]
                            updated_dir = (
                                dk < 0 if not s2.backward else dk > 0
                            )
                            if dk == 0 and not written_yet:
                                return False
                            if dk != 0 and not updated_dir:
                                # original K-offset read: undefined source
                                return False
                    if isinstance(st, gtir.Assign) and st.target.name == name:
                        if st.mask is None and not st.horizontal_masks:
                            written_yet = True
                        elif not written_yet:
                            # masked write blends with the previous value,
                            # which here would be the (skipped) seed
                            return False
                continue
            for stmt in sec.body:
                for node in eve.walk_values(stmt):
                    if not (
                        isinstance(node, gtir.FieldAccess) and node.name == name
                    ):
                        continue
                    if si < writer_idx:
                        return False
                    dk = node.offset[2]
                    lo = int(np.clip(ks + dk, 0, nk - 1))
                    hi = int(np.clip(ke - 1 + dk, 0, nk - 1))
                    if not is_covered(lo, hi):
                        return False
    return True


def _build_stage_call(
    geo: _StagedGeometry,
    stage: _Stage,
    cross_temps: set[str],
    scalar_names: list[str],
    *,
    interpret: bool,
    all_stages: "list[_Stage]",
):
    """Build stage_call(state, scalars) -> dict of updated buffers."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ni, nj, nk = geo.domain
    k_start, k_end = stage.k_start, stage.k_end
    n_steps = k_end - k_start
    backward = stage.backward

    # Buffers touched by this stage (API fields + cross-stage temps).
    def is_buffer(name: str) -> bool:
        return name in geo.analyzed.field_infos or name in cross_temps

    read_names: list[str] = []
    written_bufs: list[str] = []
    local_temps: list[str] = []
    seen: set[str] = set()
    for _, _, sec in stage.sections:
        for stmt in sec.body:
            for node in eve.walk_values(stmt):
                if isinstance(node, gtir.FieldAccess) and node.name not in seen:
                    seen.add(node.name)
    for name in seen:
        if is_buffer(name):
            read_names.append(name)
        else:
            local_temps.append(name)
    for name in sorted(stage.written):
        if is_buffer(name):
            written_bufs.append(name)

    # Written buffers are seeded from a dk=0 input alias: API fields need
    # it to preserve non-domain points through the full-block write-back,
    # and (measured) seeding temporaries is FASTER too — an unseeded,
    # partially-written output block forces the backend into a
    # read-modify-write on the out stream (vadv: 195us pruned vs 182us
    # seeded), so the "saved" input stream comes back with interest.
    # Exception: _seed_skippable (write-only fully-covered fields).
    import os as _os0

    # Cross-stage temporaries skip their seed when coverage analysis
    # proves every plane any consumer can read is unconditionally
    # written (vadv's ccol/dcol: saves two zeros materializations + two
    # seed streams, 155 -> 130 us/step at 256x256x80/v5e). Set
    # GT4PY_PALLAS_TEMP_SEED=1 to force the old always-seed behavior.
    _force_temp_seed = _os0.environ.get("GT4PY_PALLAS_TEMP_SEED", "0") not in (
        "0", "", "false",
    )
    seeded = [
        n
        for n in written_bufs
        if not _seed_skippable(
            geo.analyzed, all_stages, stage, n, geo.domain[2], geo.origins
        )
        and not (
            not _force_temp_seed
            and n in geo.temps
            and _temp_seed_skippable(all_stages, stage, n, geo.domain[2])
        )
    ]

    # Input spec list: (stream_key, dk) pairs — only streams actually
    # consumed: dk=0 original reads, shifted original reads, and seeds.
    # Data-dimension fields expand to one stream per flat index.
    def skeys(name):
        d = geo.data_n.get(name, 0)
        return [(name, f) for f in range(d)] if d else [name]

    spec_keys: list[tuple[Any, int]] = []
    for name, dk in sorted(stage.orig_reads):
        if not is_buffer(name):
            if dk != 0:
                # A loop-local temp read at a not-yet-written plane has no
                # defined source.
                raise PallasUnsupported(
                    f"original-value K-offset read of loop-local temporary '{name}'"
                )
            continue
        for sk in skeys(name):
            if (sk, dk) not in spec_keys:
                spec_keys.append((sk, dk))
    for name in seeded:
        if (name, 0) not in spec_keys:
            spec_keys.append((name, 0))

    # Carries for buffers AND local temps.
    carry_names = sorted(stage.carry_depth)

    # Shift-ring sharing: a buffer read as ORIGINAL at several K offsets
    # (vadv's u_stage[0,0,-1/0/+1], wcon[...,0/+1]; 3-D Laplacians) does
    # NOT need one HBM stream per offset — the walk visits consecutive
    # planes, so only the LEADING offset (max dk forward / min dk
    # backward) is fetched each step and the trailing offsets are served
    # from VMEM rings holding the previous steps' fetches. The fetch
    # index map clamps, so ring slot j naturally holds clamp(k + lead -
    # j - 1) == the clamped plane for dk = lead - j - 1 (forward; the
    # backward case mirrors). Slots are seeded at grid step 0 from
    # constant-index specs (one DMA each). Cuts vadv's forward stage
    # from 10 input streams to 7. Seeded names keep their (name, 0)
    # alias spec untouched; K-less and data-dim streams are excluded.
    import os as _os

    _rings_on = _os.environ.get("GT4PY_PALLAS_SHIFT_RINGS", "1") not in (
        "0", "", "false",
    )
    # Resident whole-buffer VMEM specs: a read-only buffer consumed at
    # SEVERAL K offsets maps into the kernel as ONE un-blocked VMEM ref
    # (``BlockSpec(memory_space=VMEM)``) and every offset reads it with a
    # dynamic plane slice — ZERO per-step pipeline copies, where blocked
    # specs cost one block copy per (name, dk) per grid step even when
    # XLA already holds the buffer in VMEM (the dominant cost of the
    # vadv forward stage: 5 of its 12 per-step block copies). XLA keeps
    # loop-invariant operands of such specs resident across chained
    # calls. Budgeted: buffers past the budget fall back to shift rings
    # / blocked specs.
    # Default OFF: measured SLOWER on vadv (273 vs 155 us/step at
    # 256x256x80/v5e) — XLA re-copies the whole operand HBM->VMEM per
    # call instead of keeping it resident, and the in-kernel dynamic
    # plane slices forgo the pipeline's async overlap. Kept as an
    # experiment knob for future toolchains.
    _res_budget = int(
        _os.environ.get("GT4PY_PALLAS_RESIDENT_VMEM_MB", "0")
    ) * 1024 * 1024
    resident_names: list[str] = []
    oring_lead: dict[str, int] = {}
    oring_depth: dict[str, int] = {}
    _by_name: dict[str, set[int]] = {}
    for name, dk in stage.orig_reads:
        if (
            is_buffer(name)
            and name not in seeded
            and name not in stage.written
            and not geo.data_n.get(name, 0)
            and geo.axes_mask.get(name, (True, True, True))[2]
        ):
            _by_name.setdefault(name, set()).add(dk)
    _res_bytes = 0
    for name, dks in sorted(
        _by_name.items(), key=lambda kv: -len(kv[1])
    ):
        if len(dks) < 2:
            continue
        itemsize = np.dtype(geo.dtypes[name]).itemsize
        # Full padded buffer footprint (rows are padded at call time; use
        # the domain-derived upper bound).
        ext = geo.field_ext[name]
        si_b = _round_up(ni + max(0, ext.i[1]) - min(0, ext.i[0]), _SUBLANE)
        sj_b = _round_up(nj + max(0, ext.j[1]) - min(0, ext.j[0]), _LANE)
        nbytes = nk * si_b * sj_b * itemsize
        if _res_bytes + nbytes <= _res_budget:
            resident_names.append(name)
            _res_bytes += nbytes
            spec_keys[:] = [(k, dk) for (k, dk) in spec_keys if k != name]
            continue
        if not _rings_on:
            continue
        lead = min(dks) if backward else max(dks)
        depth = (max(dks) - lead) if backward else (lead - min(dks))
        if depth <= 0:
            continue
        oring_lead[name] = lead
        oring_depth[name] = depth
        # Drop the non-lead specs; keep/add the lead spec.
        spec_keys[:] = [
            (k, dk)
            for (k, dk) in spec_keys
            if not (k == name and dk != lead)
        ]
        if (name, lead) not in spec_keys:
            spec_keys.append((name, lead))
    resident_names.sort()
    oring_names = sorted(oring_lead)

    # Ring seeding: carries read before |dk| rotations happened resolve to
    # planes PRECEDING the walk (k_start-1-d forward / k_end+d backward) —
    # never written by this stage, so their current buffer content is the
    # correct value. Seed every ring slot from an input spec at grid step 0.
    # The seed plane index is constant, so the pipeline's consecutive-index
    # comparison fetches the block once.
    seed_plan: dict[str, list[tuple[str, int]]] = {}
    const_specs: set[tuple[str, int]] = set()
    for name in sorted(stage.needs_seed):
        if not is_buffer(name):
            # A loop-local temp has no buffer to seed from; its pre-walk
            # planes are semantically undefined — let the tiled path define
            # the behavior consistently.
            raise PallasUnsupported(
                f"carry read of loop-local temporary '{name}' before any "
                f"in-stage write"
            )
        keys = []
        for d in range(stage.carry_depth[name]):
            sdk = (d + 1) if backward else -(d + 1)
            key = (name, sdk)
            if key not in spec_keys:
                spec_keys.append(key)
                const_specs.add(key)
            keys.append(key)
        seed_plan[name] = keys

    # Ring-seed const specs for the shift rings: slot j must start as
    # plane clamp(k0 + lead -+ (j+1)) — exactly the const-spec anchor for
    # dk = lead -+ (j+1).
    oring_seed: dict[str, list[tuple[str, int]]] = {}
    for name in oring_names:
        lead = oring_lead[name]
        keys = []
        for j in range(oring_depth[name]):
            sdk = lead + (j + 1) if backward else lead - (j + 1)
            key = (name, sdk)
            if key not in spec_keys:
                spec_keys.append(key)
            const_specs.add(key)
            keys.append(key)
        oring_seed[name] = keys

    # Resident buffers ride as whole-array VMEM refs (dk sentinel None).
    for name in resident_names:
        spec_keys.append((name, None))

    def kernel_factory(buf_shapes: dict[str, tuple[int, int]]):
        def kernel(*refs):
            pos = 0
            sref = {n: refs[pos + i] for i, n in enumerate(scalar_names)}
            pos += len(scalar_names)
            in_refs = {}
            for key in spec_keys:
                in_refs[key] = refs[pos]
                pos += 1
            out_refs = {n: refs[pos + i] for i, n in enumerate(written_bufs)}
            pos += len(written_bufs)
            carry_refs: dict[str, list] = {}
            for name in carry_names:
                depth = stage.carry_depth[name]
                carry_refs[name] = [refs[pos + d] for d in range(depth)]
                pos += depth
            oring_refs: dict[str, list] = {}
            for name in oring_names:
                depth = oring_depth[name]
                oring_refs[name] = [refs[pos + d] for d in range(depth)]
                pos += depth

            s = pl.program_id(0)
            k = (k_end - 1 - s) if backward else (k_start + s)

            # Seed out planes of API fields with original content (points
            # not written at this k keep their values through the full
            # write-back); temporaries skip the seed (and its HBM stream).
            for n in seeded:
                out_refs[n][...] = in_refs[(n, 0)][...]

            if seed_plan or oring_seed:
                def seed_rings():
                    for name, keys in seed_plan.items():
                        ring = carry_refs[name]
                        for d, key in enumerate(keys):
                            ring[d][...] = in_refs[key][...]
                    for name, keys in oring_seed.items():
                        ring = oring_refs[name]
                        for d, key in enumerate(keys):
                            ring[d][...] = in_refs[key][...]

                pl.when(s == 0)(seed_rings)

            # Route trailing-offset reads of ringed names to their ring
            # slots (slot j serves dk = lead -+ (j+1)); the evaluator's
            # (name, dk) lookup then needs no changes. Installed AFTER
            # the seed closure traced, so seeding still sees the const
            # input specs under these keys.
            for name in oring_names:
                lead = oring_lead[name]
                for j in range(oring_depth[name]):
                    dk = lead + (j + 1) if backward else lead - (j + 1)
                    in_refs[(name, dk)] = oring_refs[name][j]

            ev = _SeqPlaneEvaluator(
                geo, stage, in_refs, out_refs, carry_refs, sref, k
            )
            ev.resident_refs = {
                name: in_refs[(name, None)] for name in resident_names
            }
            for ks, ke, sec in stage.sections:
                def run_section(sec=sec):
                    # Fresh in-step values per section: pl.when only
                    # predicates STORES, so a value traced under section A's
                    # guard must not be readable in section B.
                    ev.begin_section()
                    for stmt in sec.body:
                        ev.exec_stmt(stmt)
                    ev.flush_section()

                if stage.order == gtir.LoopOrder.PARALLEL and ks == 0 and ke == nk:
                    run_section()
                else:
                    cond = jnp.logical_and(k >= ks, k < ke)
                    pl.when(cond)(run_section)

            # Carry rotation for buffers: final plane value lives in the out
            # ref (seeded + possibly overwritten) — unconditional update
            # handles gaps where a section did not write at this k.
            for name in carry_names:
                ring = carry_refs[name]
                for d in range(len(ring) - 1, 0, -1):
                    ring[d][...] = ring[d - 1][...]
                if name in out_refs:
                    ring[0][...] = out_refs[name][...]
                # local temps were flushed by flush_section inside pl.when

            # Shift-ring rotation: slot 0 takes this step's fetched lead
            # plane, so next step's dk = lead - 1 read finds it there.
            for name in oring_names:
                ring = oring_refs[name]
                for d in range(len(ring) - 1, 0, -1):
                    ring[d][...] = ring[d - 1][...]
                ring[0][...] = in_refs[(name, oring_lead[name])][...]

        return kernel

    def stage_call(state: dict[str, Any], scalars: dict[str, Any]) -> dict[str, Any]:
        buf_shapes = {n: state[n].shape[1:] for n in read_names}

        def stream_of(key):
            if isinstance(key, tuple):
                return state[key[0]][key[1]]
            return state[key]

        def clampk(idx):
            return jnp.clip(idx, 0, nk - 1)

        def spec_for(key, dk):
            if dk is None:  # resident whole-buffer VMEM ref
                return pl.BlockSpec(memory_space=pltpu.VMEM)
            shape = stream_of(key).shape
            name = key[0] if isinstance(key, tuple) else key

            if not geo.axes_mask.get(name, (True, True, True))[2]:
                # K-less stream: one constant plane for the whole walk.
                def index_map(s):
                    return (0, 0, 0)
            elif (key, dk) in const_specs:
                # Ring-seed stream: only the step-0 content is consumed, so
                # pin the plane index to its step-0 value (one DMA total).
                k0 = (k_end - 1) if backward else k_start
                p0 = int(np.clip(k0 + dk, 0, nk - 1))

                def index_map(s, _p0=p0):
                    return (_p0, 0, 0)
            else:
                def index_map(s, _dk=dk):
                    k = (k_end - 1 - s) if backward else (k_start + s)
                    return (clampk(k + _dk), 0, 0)

            return pl.BlockSpec((1, shape[1], shape[2]), index_map)

        scalar_args = [jnp.asarray(scalars[n]).reshape(1, 1) for n in scalar_names]
        in_args = [stream_of(k) for k, _ in spec_keys]
        out_shapes = [
            jax.ShapeDtypeStruct(state[n].shape, state[n].dtype) for n in written_bufs
        ]
        aliases = {
            len(scalar_names) + spec_keys.index((n, 0)): wi
            for wi, n in enumerate(written_bufs)
            if n in seeded
        }
        scratch = []
        for name in carry_names:
            if name in geo.temps and name not in cross_temps:
                si, sj = geo.temp_shape[name]
            else:
                si, sj = state[name].shape[1:]
            for _ in range(stage.carry_depth[name]):
                scratch.append(pltpu.VMEM((1, si, sj), geo.dtypes[name]))
        for name in oring_names:
            si, sj = state[name].shape[1:]
            for _ in range(oring_depth[name]):
                scratch.append(pltpu.VMEM((1, si, sj), geo.dtypes[name]))

        kernel = kernel_factory(buf_shapes)
        cp_kwargs: dict[str, Any] = {"dimension_semantics": ("arbitrary",)}
        if resident_names:
            # Whole resident buffers + pipeline blocks exceed the default
            # 16 MB scoped-VMEM limit; raise it toward the real v5e/v5p
            # 128 MB capacity with headroom for the Mosaic stack.
            cp_kwargs["vmem_limit_bytes"] = min(
                120 * 1024 * 1024, _res_bytes + 48 * 1024 * 1024
            )
        with jax.enable_x64(jax.config.jax_enable_x64 if interpret else False):
            results = pl.pallas_call(
                kernel,
                grid=(n_steps,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * len(scalar_names)
                + [spec_for(n, dk) for n, dk in spec_keys],
                out_specs=[spec_for(n, 0) for n in written_bufs],
                out_shape=out_shapes,
                input_output_aliases=aliases,
                scratch_shapes=scratch,
                compiler_params=pltpu.CompilerParams(**cp_kwargs),
                interpret=interpret,
            )(*scalar_args, *in_args)
        if len(written_bufs) == 1 and not isinstance(results, (tuple, list)):
            results = (results,)
        return dict(zip(written_bufs, results))

    #: per-step pipeline block-copy accounting for the roofline model
    #: (bench.py chain-major ceiling): streams that copy one (1, I, J)
    #: block per grid step. Ring-seed const specs copy once per call
    #: (excluded); resident refs copy nothing per step.
    stage_call.n_in_streams = len(
        [k for k in spec_keys if k not in const_specs and k[1] is not None]
    )
    stage_call.n_out_streams = len(written_bufs)
    stage_call.n_steps = n_steps
    return stage_call


class _SeqPlaneEvaluator(_BlockEvaluator):
    """Evaluates one section's statements on a single K plane.

    ``blocks`` semantics differ from the base class: reads resolve through
    (in-step values) -> (carries) -> (shifted original input planes);
    writes update the in-step value dict and the out plane refs.
    """

    def __init__(self, geo, stage, in_refs, out_refs, carry_refs, scalars, k):
        self.geo = geo
        self.stage = stage
        self.in_refs = in_refs
        self.out_refs = out_refs
        self.carry_refs = carry_refs
        self.scalars = scalars
        self.k = k
        self.nk = geo.nk
        self.k0 = k  # for region masks (unused: K regions not in masks)
        self.i0 = 0
        self.j0 = 0
        # In-step plane values for names written this step (keyed by name).
        self.values: dict[str, Any] = {}
        # Fused-mode extensions (set by _build_fused_call): cross-stage
        # values in full-K VMEM scratch.
        self.cross_scratch: dict[str, Any] = {}
        self.cross_from_earlier: set[str] = set()
        self.cross_store: set[str] = set()
        # Resident whole-buffer VMEM refs (set by _build_stage_call):
        # reads dynamic-slice the plane instead of consuming a blocked
        # per-step stream.
        self.resident_refs: dict[str, Any] = {}
        # plan-compat shims used by inherited helpers
        self.plan = self  # _shape/_region_mask access plan.domain/ti/tj/temps
        self.domain = geo.domain
        self.ti = geo.domain[0]
        self.tj = geo.domain[1]
        self.j_full = False
        self.temps = geo.temps
        self.field_ext = geo.field_ext
        self.origins = geo.origins
        self.analyzed = geo.analyzed

    # -- statement execution -------------------------------------------------

    def begin_section(self) -> None:
        self.values = {}
        self._written_region = {}

    def exec_stmt(self, stmt: gtir.Stmt) -> None:
        import jax.numpy as jnp

        ext = self.analyzed.stmt_extents[stmt]
        ctx = (ext, 0, 1, None)
        self._memo = {}
        assert isinstance(stmt, gtir.Assign)
        value = self._broadcast(self.eval_expr(stmt.value, ctx), ctx)
        mask = None
        if stmt.mask is not None:
            mask = self._broadcast(self.eval_expr(stmt.mask, ctx), ctx)
        if stmt.horizontal_masks:
            rmask = self._region_mask(stmt.horizontal_masks, ctx)
            mask = rmask if mask is None else jnp.logical_and(mask, rmask)
        self._write(stmt.target.name, value, mask, ctx)

    def flush_section(self) -> None:
        """Store written buffer planes to their out refs (inside pl.when).

        ``_written_region[name]`` is in ABSOLUTE plane coordinates (row 0 ==
        plane row 0), so the store slice is direct.
        """
        for name, value in self.values.items():
            if name in self.out_refs:
                alo_i, ahi_i, alo_j, ahi_j = self._written_region[name]
                self.out_refs[name][0:1, alo_i:ahi_i, alo_j:ahi_j] = value
            if name in self.cross_store:
                from jax.experimental import pallas as pl

                alo_i, ahi_i, alo_j, ahi_j = self._written_region[name]
                self.cross_scratch[name][
                    pl.ds(self.k, 1), alo_i:ahi_i, alo_j:ahi_j
                ] = value
            if name in self.carry_refs and name not in self.out_refs:
                # Local temp carry: rotate and store the full-extent plane.
                ring = self.carry_refs[name]
                full = self._temp_full(name)
                for d in range(len(ring) - 1, 0, -1):
                    ring[d][...] = ring[d - 1][...]
                ring[0][0:1, : full.shape[1], : full.shape[2]] = full

    # -- base offsets ----------------------------------------------------

    def _i_base(self, name: str) -> int:
        if name in self.temps:
            return -self.field_ext[name].i[0]
        return self.origins[name][0]

    def _j_base(self, name: str) -> int:
        if name in self.temps:
            return -self.field_ext[name].j[0]
        return self.origins[name][1]

    def _shape(self, ctx):
        ext, ks, ke, k_seq = ctx
        return (1, self.ti + ext.i[1] - ext.i[0], self.tj + ext.j[1] - ext.j[0])

    def _temp_full(self, name: str):
        """Current temp value expanded to its full plane extent."""
        import jax.numpy as jnp

        val = self.values[name]
        ext = self.field_ext[name]
        full_i = self.ti + ext.i[1] - ext.i[0]
        full_j = self.tj + ext.j[1] - ext.j[0]
        alo_i, ahi_i, alo_j, ahi_j = self._written_region[name]
        if (alo_i, ahi_i, alo_j, ahi_j) == (0, full_i, 0, full_j):
            return val
        pad = ((0, 0), (alo_i, full_i - ahi_i), (alo_j, full_j - ahi_j))
        return jnp.pad(val, pad)

    # -- reads / writes ----------------------------------------------------

    _written_region: dict[str, tuple[int, int, int, int]]

    def _read(self, access: gtir.FieldAccess, ctx):
        import jax.numpy as jnp

        ext, ks, ke, k_seq = ctx
        name = access.name
        if self.geo.data_n.get(name, 0):
            return self._read_datadim_seq(access, ctx)
        di, dj, dk = access.offset
        NK, NI, NJ = self._shape(ctx)
        xi = self._i_base(name) + ext.i[0] + di
        xj = self._j_base(name) + ext.j[0] + dj
        updated_dir = dk < 0 if not self.backward_ else dk > 0

        if dk == 0 and name in self.values:
            # In-step value: absolute plane coords into the written region.
            alo_i, ahi_i, alo_j, ahi_j = self._written_region[name]
            vi = xi - alo_i
            vj = xj - alo_j
            if vi < 0 or vj < 0 or vi + NI > ahi_i - alo_i or vj + NJ > ahi_j - alo_j:
                raise PallasUnsupported(
                    f"read of '{name}' outside its in-step written region"
                )
            return self.values[name][:, vi : vi + NI, vj : vj + NJ]
        if name in self.carry_refs and dk != 0 and name in self.stage.written and updated_dir:
            ring = self.carry_refs[name]
            ref = ring[abs(dk) - 1]
            return ref[0:1, xi : xi + NI, xj : xj + NJ]
        if name in self.cross_from_earlier:
            from jax.experimental import pallas as pl

            kidx = jnp.clip(self.k + dk, 0, self.nk - 1)
            return self.cross_scratch[name][
                pl.ds(kidx, 1), xi : xi + NI, xj : xj + NJ
            ]
        if name in self.resident_refs:
            from jax.experimental import pallas as pl

            kidx = jnp.clip(self.k + dk, 0, self.nk - 1)
            return self.resident_refs[name][
                pl.ds(kidx, 1), xi : xi + NI, xj : xj + NJ
            ]
        return self._orig_stream_read(name, name, access, ctx)

    def _orig_stream_read(self, skey, name, access, ctx):
        """Read one original-input stream (plain, lower-dim broadcast, or a
        single data-dim stream keyed (name, flat))."""
        import jax.numpy as jnp

        ext, _, _, _ = ctx
        di, dj, dk = access.offset
        NK, NI, NJ = self._shape(ctx)
        bi, bj, bk = self.geo.axes_mask.get(name, (True, True, True))
        xi = self._i_base(name) + ext.i[0] + di if bi else 0
        xj = self._j_base(name) + ext.j[0] + dj if bj else 0
        si = NI if bi else 1
        sj = NJ if bj else 1
        ref = self.in_refs.get((skey, dk if bk else 0))
        if ref is None and dk == 0:
            ref = self.in_refs.get((skey, 0))
        if ref is None:
            raise PallasUnsupported(f"unresolvable read {name}[{di},{dj},{dk}]")
        sub = ref[0:1, xi : xi + si, xj : xj + sj]
        if sub.shape != (1, NI, NJ):
            sub = jnp.broadcast_to(sub, (1, NI, NJ))
        return sub

    def _read_datadim_seq(self, access: gtir.FieldAccess, ctx):
        """Data-dim field read: static indices pick one stream, dynamic
        indices one-hot select over the (capped) stream set."""
        import itertools

        import jax.numpy as jnp

        name = access.name
        shape_d = self.geo.data_shape[name]
        if len(access.data_index) != len(shape_d):
            raise PallasUnsupported(f"partial data index on '{name}'")
        vals = [self.eval_expr(e, ctx) for e in access.data_index]
        static = []
        dyn = []
        for v in vals:
            if isinstance(v, (int, np.integer)) or (
                isinstance(v, np.ndarray) and v.ndim == 0
            ):
                static.append(int(v))
                dyn.append(None)
            else:
                static.append(None)
                dyn.append(self._broadcast(v, ctx).astype(jnp.int32))
        if all(s is not None for s in static):
            flat = int(np.ravel_multi_index(static, shape_d))
            return self._orig_stream_read((name, flat), name, access, ctx)
        acc = None
        spaces = [
            [s] if s is not None else range(dim) for s, dim in zip(static, shape_d)
        ]
        for multi in itertools.product(*spaces):
            cond = None
            for d, v in enumerate(multi):
                if static[d] is not None:
                    continue
                c = dyn[d] == v
                cond = c if cond is None else jnp.logical_and(cond, c)
            flat = int(np.ravel_multi_index(multi, shape_d))
            val = self._orig_stream_read((name, flat), name, access, ctx)
            acc = val if acc is None else jnp.where(cond, val, acc)
        return acc

    @property
    def backward_(self) -> bool:
        return self.stage.backward

    def _write(self, name: str, value, mask, ctx) -> None:
        import jax.numpy as jnp
        from jax import lax

        ext, _, _, _ = ctx
        NK, NI, NJ = self._shape(ctx)
        # Absolute plane coordinates of the written region.
        alo_i = self._i_base(name) + ext.i[0]
        ahi_i = alo_i + NI
        alo_j = self._j_base(name) + ext.j[0]
        ahi_j = alo_j + NJ

        if not hasattr(self, "_written_region"):
            self._written_region = {}
        if mask is not None:
            prev = self._read(gtir.FieldAccess(name=name, offset=(0, 0, 0)), ctx)
            value = jnp.where(mask, value, prev)
        dtype = np.dtype(self.geo.dtypes[name]) if name in self.geo.dtypes else value.dtype
        value = value.astype(dtype)

        region = (alo_i, ahi_i, alo_j, ahi_j)
        if name in self.values and self._written_region[name] != region:
            # Later statement writes a different region: blend over the union.
            plo_i, phi_i, plo_j, phi_j = self._written_region[name]
            ulo_i, uhi_i = min(alo_i, plo_i), max(ahi_i, phi_i)
            ulo_j, uhi_j = min(alo_j, plo_j), max(ahi_j, phi_j)
            prev = jnp.pad(
                self.values[name],
                ((0, 0), (plo_i - ulo_i, uhi_i - phi_i), (plo_j - ulo_j, uhi_j - phi_j)),
            )
            padded_new = jnp.pad(
                value,
                ((0, 0), (alo_i - ulo_i, uhi_i - ahi_i), (alo_j - ulo_j, uhi_j - ahi_j)),
            )
            ii = lax.broadcasted_iota(jnp.int32, prev.shape, 1)
            jj = lax.broadcasted_iota(jnp.int32, prev.shape, 2)
            inside = (
                (ii >= alo_i - ulo_i)
                & (ii < ahi_i - ulo_i)
                & (jj >= alo_j - ulo_j)
                & (jj < ahi_j - ulo_j)
            )
            self.values[name] = jnp.where(inside, padded_new, prev)
            self._written_region[name] = (ulo_i, uhi_i, ulo_j, uhi_j)
        else:
            self.values[name] = value
            self._written_region[name] = region


# ---------------------------------------------------------------------------
# Fused multi-stage call: all vertical loops in ONE pallas_call.
# ---------------------------------------------------------------------------

# Upper bound for full-K VMEM scratch holding cross-stage values (v5e/v5p
# have 128 MB VMEM; leave room for plane blocks and the Mosaic stack).
_FUSE_SCRATCH_BUDGET = 80 * 1024 * 1024


def _cross_names(geo: _StagedGeometry, stages: list[_Stage]) -> Optional[set[str]]:
    """Names written in one stage and read in a LATER stage. Returns None
    when the pattern is too complex to fuse (a name written in several
    stages, or re-written after being cross-read)."""
    writer: dict[str, int] = {}
    cross: set[str] = set()
    for idx, stage in enumerate(stages):
        reads: set[str] = set()
        for _, _, sec in stage.sections:
            for stmt in sec.body:
                for node in eve.walk_values(stmt):
                    if isinstance(node, gtir.FieldAccess):
                        reads.add(node.name)
        for name in reads:
            w = writer.get(name)
            if w is not None and w != idx:
                cross.add(name)
        for name in stage.written:
            if name in writer and writer[name] != idx:
                return None  # written in two stages: unsupported for fusion
            writer[name] = idx
    return cross


def _fuse_scratch_bytes(geo: _StagedGeometry, cross: set[str]) -> int:
    total = 0
    for name in cross:
        if name in geo.temps:
            si, sj = geo.temp_shape[name]
        else:
            ni, nj, _ = geo.domain
            ext = geo.field_ext[name]
            oi, oj, _ = geo.origins[name]
            si = _round_up(oi + ni + max(0, ext.i[1]), _SUBLANE)
            sj = _round_up(oj + nj + max(0, ext.j[1]), _LANE)
        total += geo.nk * si * sj * np.dtype(geo.dtypes[name]).itemsize
    return total


def _build_fused_call(
    geo: _StagedGeometry,
    stages: list[_Stage],
    cross: set[str],
    scalar_names: list[str],
    *,
    interpret: bool,
):
    """One pallas_call walking all stages' K ranges back to back; values
    crossing stage boundaries live in full-K VMEM scratch, never HBM."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ni, nj, nk = geo.domain
    for stage in stages:
        if stage.needs_seed:
            # Ring seeding is implemented for per-stage calls only.
            raise PallasUnsupported("fused: carry ring needs pre-walk seeding")
        # Cross-stage values are read from full-K VMEM scratch at arbitrary
        # (clamped) plane indices; require every stage to walk [0, nk)
        # contiguously so every read plane was actually written.
        covered = sorted((ks, ke) for ks, ke, _ in stage.sections)
        pos_k = 0
        for ks, ke in covered:
            if ks > pos_k:
                break
            pos_k = max(pos_k, ke)
        if pos_k != nk or (covered and covered[0][0] != 0):
            raise PallasUnsupported("fused: stage does not cover the full K range")
    offs = []
    total_steps = 0
    for stage in stages:
        offs.append(total_steps)
        total_steps += stage.k_end - stage.k_start

    def is_buffer(name: str) -> bool:
        return name in geo.analyzed.field_infos

    # Per-stage classification.
    stage_specs: list[list[tuple[str, int]]] = []
    stage_seeded: list[list[str]] = []
    stage_written_bufs: list[list[str]] = []
    stage_cross_from_earlier: list[set[str]] = []
    written_before: set[str] = set()
    for stage in stages:
        from_earlier = {n for n in written_before if n in cross}
        stage_cross_from_earlier.append(from_earlier)
        written_before |= stage.written

        specs: list[tuple[str, int]] = []
        for name, dk in sorted(stage.orig_reads):
            if name in from_earlier:
                continue  # resolved from scratch
            if not is_buffer(name) and name not in geo.temps:
                continue
            if not is_buffer(name):
                if dk != 0:
                    raise PallasUnsupported(
                        f"original K-offset read of loop-local temp '{name}'"
                    )
                continue
            if (name, dk) not in specs:
                specs.append((name, dk))
        written_bufs_s = sorted(n for n in stage.written if is_buffer(n))
        # Same seed-skip rule as the per-stage call (_seed_skippable).
        seeded = [
            n
            for n in written_bufs_s
            if not _seed_skippable(
                geo.analyzed, stages, stage, n, geo.domain[2], geo.origins
            )
        ]
        for name in seeded:
            if (name, 0) not in specs:
                specs.append((name, 0))
        stage_specs.append(specs)
        stage_seeded.append(seeded)
        stage_written_bufs.append(written_bufs_s)

    # Flat operand list: (stage_idx, name, dk).
    flat_specs: list[tuple[int, str, int]] = []
    for si, specs in enumerate(stage_specs):
        for name, dk in specs:
            flat_specs.append((si, name, dk))
    # Outputs: API fields, written by exactly one stage (checked above).
    out_names: list[tuple[int, str]] = []
    for si, names in enumerate(stage_written_bufs):
        for n in names:
            out_names.append((si, n))

    def k_of(si: int, s):
        stage = stages[si]
        rel = s - offs[si]
        return (stage.k_end - 1 - rel) if stage.backward else (stage.k_start + rel)

    def k_anchor(si: int, dk: int) -> int:
        stage = stages[si]
        k0 = (stage.k_end - 1) if stage.backward else stage.k_start
        return int(np.clip(k0 + dk, 0, nk - 1))

    def kernel(*refs):
        pos = 0
        sref = {n: refs[pos + i] for i, n in enumerate(scalar_names)}
        pos += len(scalar_names)
        in_refs_flat = {}
        for key in flat_specs:
            in_refs_flat[key] = refs[pos]
            pos += 1
        out_refs_flat = {}
        for key in out_names:
            out_refs_flat[key] = refs[pos]
            pos += 1
        cross_scratch = {}
        for name in sorted(cross):
            cross_scratch[name] = refs[pos]
            pos += 1
        carry_refs_all: list[dict[str, list]] = []
        for stage in stages:
            d: dict[str, list] = {}
            for name in sorted(stage.carry_depth):
                depth = stage.carry_depth[name]
                d[name] = [refs[pos + i] for i in range(depth)]
                pos += depth
            carry_refs_all.append(d)

        s = pl.program_id(0)

        for si, stage in enumerate(stages):
            k = k_of(si, s)
            active = jnp.logical_and(s >= offs[si], s < offs[si] + (stage.k_end - stage.k_start))
            in_refs = {
                (n, dk): r for (sj, n, dk), r in in_refs_flat.items() if sj == si
            }
            out_refs = {n: out_refs_flat[(si, n)] for n in stage_written_bufs[si]}

            def seed(out_refs=out_refs, in_refs=in_refs, seeded=stage_seeded[si]):
                for n in seeded:
                    out_refs[n][...] = in_refs[(n, 0)][...]

            pl.when(active)(seed)

            ev = _SeqPlaneEvaluator(
                geo, stage, in_refs, out_refs, carry_refs_all[si], sref, k
            )
            ev.cross_scratch = cross_scratch
            ev.cross_from_earlier = stage_cross_from_earlier[si]
            ev.cross_store = {n for n in stage.written if n in cross}
            for ks, ke, sec in stage.sections:
                def run_section(sec=sec, ev=ev):
                    ev.begin_section()
                    for stmt in sec.body:
                        ev.exec_stmt(stmt)
                    ev.flush_section()

                cond = jnp.logical_and(active, jnp.logical_and(k >= ks, k < ke))
                pl.when(cond)(run_section)

            def rotate(si=si, stage=stage, out_refs=out_refs):
                ring_map = carry_refs_all[si]
                for name in sorted(stage.carry_depth):
                    ring = ring_map[name]
                    for d in range(len(ring) - 1, 0, -1):
                        ring[d][...] = ring[d - 1][...]
                    if name in out_refs:
                        ring[0][...] = out_refs[name][...]

            if stage.carry_depth:
                pl.when(active)(rotate)

    def fused_call(state: dict[str, Any], scalars: dict[str, Any]) -> dict[str, Any]:
        def spec_for(si, name, dk, shape):
            stage = stages[si]
            lo, hi = stage.k_start, stage.k_end - 1

            def index_map(s, _si=si, _dk=dk, _lo=lo, _hi=hi):
                # Pure clamp, no select: outside this stage's phase the
                # plane index saturates to a CONSTANT so the pipeline's
                # consecutive-index comparison can elide the copies.
                k = k_of(_si, s)
                idx = jnp.clip(jnp.clip(k, _lo, _hi) + _dk, 0, nk - 1)
                return (idx, 0, 0)

            return pl.BlockSpec((1, shape[1], shape[2]), index_map)

        scalar_args = [jnp.asarray(scalars[n]).reshape(1, 1) for n in scalar_names]
        in_args = [state[n] for (_, n, _) in flat_specs]
        out_shapes = [
            jax.ShapeDtypeStruct(state[n].shape, state[n].dtype) for _, n in out_names
        ]
        aliases = {}
        for wi, (si, n) in enumerate(out_names):
            if (si, n, 0) in flat_specs:  # unseeded write-only: fresh buffer
                aliases[len(scalar_names) + flat_specs.index((si, n, 0))] = wi

        scratch = []
        for name in sorted(cross):
            if name in geo.temps:
                sih, sjh = geo.temp_shape[name]
            else:
                sih, sjh = state[name].shape[1:]
            scratch.append(pltpu.VMEM((nk, sih, sjh), geo.dtypes[name]))
        for stage in stages:
            for name in sorted(stage.carry_depth):
                if name in geo.temps:
                    sih, sjh = geo.temp_shape[name]
                else:
                    sih, sjh = state[name].shape[1:]
                for _ in range(stage.carry_depth[name]):
                    scratch.append(pltpu.VMEM((1, sih, sjh), geo.dtypes[name]))

        kernel_fn = kernel
        with jax.enable_x64(jax.config.jax_enable_x64 if interpret else False):
            results = pl.pallas_call(
                kernel_fn,
                grid=(total_steps,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * len(scalar_names)
                + [
                    spec_for(si, n, dk, state[n].shape)
                    for (si, n, dk) in flat_specs
                ],
                out_specs=[
                    spec_for(si, n, 0, state[n].shape) for (si, n) in out_names
                ],
                out_shape=out_shapes,
                input_output_aliases=aliases,
                scratch_shapes=scratch,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    # Full-K cross-stage scratch exceeds the default Mosaic
                    # VMEM limit; raise it to the real v5e/v5p capacity
                    # minus pipeline headroom.
                    vmem_limit_bytes=110 * 1024 * 1024,
                ),
                interpret=interpret,
            )(*scalar_args, *in_args)
        if len(out_names) == 1 and not isinstance(results, (tuple, list)):
            results = (results,)
        return {n: r for (_, n), r in zip(out_names, results)}

    return fused_call
