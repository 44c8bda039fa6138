"""J-halo-split plane strategy: lane-aligned kernels for PARALLEL stencils.

Motivation (measured on v5e, hdiff 256x256x80 f32): the standard plane
strategy keeps each field as one padded (K, I, J) block, so a domain of
nj=256 with a J halo of 2 becomes 260 columns -> 3 lane tiles (384), and
EVERY vector op — including the relayout pass each shifted read costs —
processes 50% more lanes than the domain needs. hdiff is VPU-bound at this
shape, so that padding is pure slowdown (119us/step, 0.65 of the 3-stream
HBM roofline).

This strategy splits every field (and temporary) into
  * a MAIN part: (K, Ipad, nj) holding exactly the domain columns — lane
    aligned whenever nj % 128 == 0, and
  * a narrow J-STRIP: (K, Ipad, w) holding the halo/extra columns packed
    left-then-right (w <= 8 for stencil halos),
and evaluates every expression twice — once for the main columns, once for
the strip columns the statement's extent requires. Shifted J reads become a
two-piece concatenate (strip slice ++ main slice), so intermediates like
hdiff's ``lap`` are computed ONCE at domain width plus a cheap 8-wide halo
column, instead of once at domain+halo width rounded up to a whole extra
lane tile. The I axis keeps its halo inside the main block (sublane
granularity is 8, so the waste is ~2%, and I-shifts are row slices).

The output main block is written in full (partial row seeds cover I-halo
rows), so no full-block seed stream is needed; the output strip is
untouched by halo-free writes and passes through outside the kernel at
zero cost — this removes the 4th HBM stream of the standard plane scheme.

Measured: hdiff 119us -> 89-95us/step (0.81-0.87 of the 3-stream roofline).

Reference role: this is the TPU analog of the IJ-cache/block-layout tuning
the reference's generated CUDA applies per-backend
(/root/reference/src/gt4py/cartesian/gtc/passes/oir_optimizations/caches.py:44,
backend/gtcpp_backend.py:169); the reference has no lane-padding concern,
so the design is original to the TPU build.

Measured NEGATIVE results (v5e, hdiff 256x256x80 f32, long-chain timing —
do not re-try without new information):
  * XLA keeps the whole chained working set VMEM-resident (HLO shows S(1)
    on every loop buffer; a trivial 3-stream kernel runs at ~8us/step =
    ~10TB/s effective), so the kernel is VPU-bound: optimizations must cut
    vector ops, not HBM streams.
  * tk ladder: 2/4 ~95.5us, 8/10 ~97us, 16/20 ~213us (grid too coarse
    starves the pipeline), >=40 crashes Mosaic even with vmem_limit_bytes
    raised to 100MB.
  * XLA-side precompute of the temp J-strips ("zone" evaluation feeding
    the strips in as narrow operands, kernel skipping halo parts): net
    LOSS. In-kernel halo parts cost only ~10us; replacing the halo-part
    concat windows with roll+iota-masked patches (required because Mosaic
    cannot concatenate an in-kernel value carrying sublane layout offset 1
    with an offset-0 operand) costs ~7us back, and the XLA zone fusion
    triggers full-array {1,0,2} relayout copies (~+96us) unless fenced;
    optimization_barrier fences cost even more (~250us total).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from gt4py_tpu import eve
from gt4py_tpu.cartesian import gtir
from gt4py_tpu.cartesian.definitions import AccessKind, Extent
from gt4py_tpu.cartesian.passes.pipeline import AnalyzedStencil

from gt4py_tpu.cartesian.backend.pallas_codegen import (
    PallasUnsupported,
    _LANE,
    _SUBLANE,
    _round_up,
)


_MAX_STRIP = 64  # widest packed J-strip the kernel will carry per field


def split_eligible(analyzed: AnalyzedStencil, domain) -> bool:
    """Plane-eligibility is assumed checked by the caller; this adds the
    split-specific constraints."""
    ni, nj, nk = domain
    if nj < _LANE or nj % _LANE != 0:
        return False
    for name, ext in analyzed.field_extents.items():
        if ext.j[1] - ext.j[0] > 8:
            return False
    for p in analyzed.stencil.params:
        if isinstance(p, gtir.FieldDecl) and (
            p.dimensions != (True, True, True) or p.data_dims
        ):
            return False  # lower-dim/data-dim fields run the plane strategy
    return True


class _SplitGeometry:
    def __init__(self, analyzed: AnalyzedStencil, domain, origins):
        self.analyzed = analyzed
        self.stencil = analyzed.stencil
        self.domain = domain
        self.origins = dict(origins)
        ni, nj, nk = domain
        self.nj = nj

        self.field_ext: dict[str, Extent] = {}
        self.fields: list[str] = []
        self.writes: list[str] = []
        self.read_fields: set[str] = set()
        for name, info in analyzed.field_infos.items():
            if info.access == AccessKind.NONE:
                continue
            self.field_ext[name] = analyzed.field_extents.get(name, Extent.zeros())
            self.fields.append(name)
            if info.access & AccessKind.WRITE:
                self.writes.append(name)
            if info.access & AccessKind.READ:
                self.read_fields.add(name)
        self.temps = {t.name: t for t in self.stencil.temporaries}
        for t in self.stencil.temporaries:
            self.field_ext[t.name] = analyzed.field_extents.get(t.name, Extent.zeros())

        self.dtypes = {
            n: (
                analyzed.field_infos[n].dtype
                if n in analyzed.field_infos
                else (self.temps[n].dtype or np.float64)
            )
            for n in self.field_ext
        }
        # Half-precision COMPUTE dtype: the v5e/v5p VPU executes bf16/f16
        # elementwise ops at the f32 rate, and Mosaic lacks half vector
        # compares — so half fields compute in f32 (one upcast per loaded
        # block, one downcast at the store) while STORAGE stays half, the
        # same in-half/accumulate-f32 convention the MXU uses natively.
        # Intermediates carry f32 precision (within every backend's half
        # tolerance). GT4PY_PALLAS_HALF_COMPUTE_F32=0 restores literal
        # half-dtype compute.
        import os as _os

        from gt4py_tpu.core.definitions import HALF_FLOAT_DTYPES

        _hc = _os.environ.get("GT4PY_PALLAS_HALF_COMPUTE_F32", "1") not in (
            "0", "", "false",
        )
        self.compute_dtypes = {
            n: (
                np.dtype(np.float32)
                if _hc and np.dtype(dt) in HALF_FLOAT_DTYPES
                else np.dtype(dt)
            )
            for n, dt in self.dtypes.items()
        }
        #: whether any half dtype was widened to an f32 compute dtype
        self.half_compute = any(
            np.dtype(self.dtypes[n]) != self.compute_dtypes[n]
            for n in self.compute_dtypes
        )

        # Fields whose strip is WRITTEN (a write statement with J extent).
        self.strip_written: set[str] = set()
        # Fields needing a full main seed: read anywhere, or written under a
        # mask / horizontal region / K sub-interval (those writes read the
        # previous value, so the out block must hold it everywhere).
        self.full_seed: set[str] = set()
        for vloop in self.stencil.vertical_loops:
            for section in vloop.sections:
                ks, ke = section.interval.resolve(nk)
                full_k = ks == 0 and ke == nk
                for stmt in section.body:
                    ext = analyzed.stmt_extents[stmt]
                    tname = stmt.target.name
                    if ext.j != (0, 0) and tname in analyzed.field_infos:
                        self.strip_written.add(tname)
                    if tname in analyzed.field_infos and (
                        stmt.mask is not None
                        or stmt.horizontal_masks
                        or not full_k
                    ):
                        self.full_seed.add(tname)
        for name in self.writes:
            if name in self.read_fields:
                self.full_seed.add(name)

    # J-strip slot mapping: slot s < lo_w holds column J = s - lo_w;
    # slot s >= lo_w holds column J = nj + (s - lo_w).
    def lo_width(self, name: str) -> int:
        if name in self.temps:
            return -self.field_ext[name].j[0]
        return self.origins[name][1]

    def temp_strip_width(self, name: str) -> int:
        ext = self.field_ext[name]
        return (ext.j[1] - ext.j[0]) if ext.j != (0, 0) else 0


def build_plane_split_fn(
    analyzed: AnalyzedStencil,
    domain: tuple[int, int, int],
    origins: dict[str, tuple[int, int, int]],
    *,
    tk: int,
    interpret: bool = False,
):
    """Build fn(arrays: dict[name -> (I, J, K)], scalars) -> written arrays.

    Native-layout API: ``encode`` returns a (main, strip) pair per field
    (strip may be None); ``call_padded`` consumes/produces such pairs, so
    chained steps stay split with zero per-step conversion.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gt4py_tpu.cartesian.backend.pallas_codegen import _check_supported

    _check_supported(analyzed, interpret=interpret)
    if not split_eligible(analyzed, domain):
        raise PallasUnsupported("split plane: not eligible")
    # Multi-read temporaries stay materialized (computed once as VMEM
    # values, sliced per shifted read) — the recompute the default inlining
    # introduces is pure VPU cost in these compute-bound kernels.
    analyzed = analyzed.materialized_variant()
    if not split_eligible(analyzed, domain):
        raise PallasUnsupported("split plane: not eligible (materialized)")

    ni, nj, nk = domain
    nkp = _round_up(nk, tk)
    geo = _SplitGeometry(analyzed, domain, origins)
    reads = geo.fields
    writes = geo.writes
    scalar_names = [
        n for n, i in analyzed.parameter_infos.items() if i.access != AccessKind.NONE
    ]
    if nkp != nk:
        # K-padding rows turn every write into a masked write.
        geo.full_seed.update(writes)
    # Write-only outputs whose domain writes cover the full main block except
    # the I-halo rows: stream ONLY those halo rows in (a (K, <=8, nj) seed
    # operand) instead of the whole main block — this removes a full HBM
    # read stream per such output (hdiff: 4 streams -> 3).
    import os as _os

    narrow_seed = set()
    if _os.environ.get("GT4PY_SPLIT_NARROW_SEED", "1") not in ("0", "", "false"):
        narrow_seed = {n for n in writes if n not in geo.full_seed}

    def encode(n: str, a: Any):
        """(I, J, K) public array -> (main (K,Ipad,nj), strip or None)."""
        oj = origins[n][1]
        ok = origins[n][2]
        kf = jnp.transpose(a, (2, 0, 1))
        rows = kf[ok : ok + min(nk, kf.shape[0] - ok)]
        pk = nkp - rows.shape[0]
        pi = _round_up(rows.shape[1], _SUBLANE) - rows.shape[1]
        rows = jnp.pad(rows, ((0, pk), (0, pi), (0, 0)))
        if rows.shape[2] < oj + nj:
            raise PallasUnsupported("split plane: array narrower than domain")
        main = rows[:, :, oj : oj + nj]
        w = rows.shape[2] - nj
        if w == 0:
            return main, None
        if w > _MAX_STRIP:
            raise PallasUnsupported("split plane: J strip too wide")
        strip = jnp.concatenate([rows[:, :, :oj], rows[:, :, oj + nj :]], axis=2)
        return main, strip

    def decode(n: str, pair: Any, original: Any) -> Any:
        main, strip = pair
        kf = jnp.transpose(original, (2, 0, 1))
        ok = origins[n][2]
        oj = origins[n][1]
        nrows = min(nk, kf.shape[0] - ok)
        ni_a, nj_a = kf.shape[1], kf.shape[2]
        parts = []
        if oj > 0:
            parts.append(strip[:nrows, :ni_a, :oj])
        parts.append(main[:nrows, :ni_a, :])
        if nj_a > oj + nj:
            parts.append(strip[:nrows, :ni_a, oj : oj + (nj_a - oj - nj)])
        rows = jnp.concatenate(parts, axis=2) if len(parts) > 1 else parts[0]
        if ok > 0 or ok + nrows < kf.shape[0]:
            rows = jnp.concatenate([kf[:ok], rows, kf[ok + nrows :]], axis=0)
        return jnp.transpose(rows, (1, 2, 0))

    def call_padded(padded: dict[str, Any], scalars: dict[str, Any]) -> dict[str, Any]:
        # Fields with live strip reads/writes need the strip operand.
        strip_w = {
            n: (0 if padded[n][1] is None else padded[n][1].shape[2]) for n in reads
        }
        for n in reads:
            ext = geo.field_ext[n]
            need_l = -ext.j[0]
            need_r = ext.j[1]
            oj = origins[n][1]
            have_l = min(oj, strip_w[n])
            have_r = strip_w[n] - have_l if strip_w[n] else 0
            if need_l > have_l or need_r > have_r:
                raise PallasUnsupported("split plane: strip narrower than J halo")

        strip_in = [n for n in reads if strip_w[n] > 0 and geo.field_ext[n].j != (0, 0)]
        strip_out = [n for n in writes if n in geo.strip_written and strip_w[n] > 0]
        for n in strip_out:
            if n not in strip_in:
                strip_in.append(n)  # seed source

        main_shapes = {n: padded[n][0].shape for n in reads}
        ipad = {n: main_shapes[n][1] for n in reads}

        # Narrow-seed outputs: the main block is NOT an input stream; only
        # the I-halo rows travel in, as a packed (K, lo+hi_rows, nj) operand.
        main_stream = [n for n in reads if n not in narrow_seed]
        seed_rows = {}  # name -> (lo, hrows)
        for n in writes:
            if n not in narrow_seed:
                continue
            lo = origins[n][0]
            hi = lo + ni
            hrows = lo + (ipad[n] - hi)
            if hrows > 0:
                seed_rows[n] = (lo, hrows)
        seed_in = list(seed_rows)

        def kernel(*refs):
            pos = 0
            sref = {n: refs[pos + i] for i, n in enumerate(scalar_names)}
            pos += len(scalar_names)
            main_in = {n: refs[pos + i] for i, n in enumerate(main_stream)}
            pos += len(main_stream)
            strip_refs = {n: refs[pos + i] for i, n in enumerate(strip_in)}
            pos += len(strip_in)
            seed_refs = {n: refs[pos + i] for i, n in enumerate(seed_in)}
            pos += len(seed_in)
            main_out = {n: refs[pos + i] for i, n in enumerate(writes)}
            pos += len(writes)
            strip_out_refs = {n: refs[pos + i] for i, n in enumerate(strip_out)}
            pos += len(strip_out)

            blocks_main: dict[str, Any] = {}
            blocks_strip: dict[str, Any] = {}

            def _load(val, n):
                # half-precision blocks upcast ONCE at load; all compute
                # runs in f32 (geo.compute_dtypes), stores downcast
                cdt = geo.compute_dtypes[n]
                return val if val.dtype == cdt else val.astype(cdt)

            for n in reads:
                if n in main_out:
                    oref = main_out[n]
                    if n in narrow_seed:
                        # Domain writes cover all rows but the I-halo; seed
                        # those from the packed narrow operand (no full main
                        # input stream for this field).
                        if n in seed_refs:
                            lo, _ = seed_rows[n]
                            hi = lo + ni
                            if lo > 0:
                                oref[:, 0:lo, :] = seed_refs[n][:, 0:lo, :]
                            if hi < ipad[n]:
                                oref[:, hi : ipad[n], :] = seed_refs[n][:, lo:, :]
                    elif n in geo.full_seed:
                        oref[...] = main_in[n][...]
                    blocks_main[n] = oref
                else:
                    blocks_main[n] = _load(main_in[n][...], n)
                if n in strip_out_refs:
                    strip_out_refs[n][...] = strip_refs[n][...]
                    blocks_strip[n] = strip_out_refs[n]
                elif n in strip_refs:
                    blocks_strip[n] = _load(strip_refs[n][...], n)
            # Temporaries materialize lazily at their first write (a masked
            # first write reads zeros via the evaluator's lazy init).

            k0 = pl.program_id(0) * tk
            ev = _SplitEvaluator(geo, blocks_main, blocks_strip, sref, k0, tk, nkp)
            ev.run()

        scalar_args = [jnp.asarray(scalars[n]).reshape(1, 1) for n in scalar_names]
        seed_args = []
        seed_shapes = {}
        for n in seed_in:
            lo, hrows = seed_rows[n]
            hi = lo + ni
            m = padded[n][0]
            parts = []
            if lo > 0:
                parts.append(m[:, 0:lo, :])
            if hi < ipad[n]:
                parts.append(m[:, hi:, :])
            seed = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
            seed_args.append(seed)
            seed_shapes[n] = seed.shape
        in_args = (
            [padded[n][0] for n in main_stream]
            + [padded[n][1] for n in strip_in]
            + seed_args
        )
        out_shapes = [
            jax.ShapeDtypeStruct(padded[n][0].shape, padded[n][0].dtype) for n in writes
        ] + [
            jax.ShapeDtypeStruct(padded[n][1].shape, padded[n][1].dtype)
            for n in strip_out
        ]
        aliases = {}
        for wi, n in enumerate(writes):
            if n in main_stream:
                aliases[len(scalar_names) + main_stream.index(n)] = wi
        for wi, n in enumerate(strip_out):
            aliases[
                len(scalar_names) + len(main_stream) + strip_in.index(n)
            ] = len(writes) + wi

        def bspec(shape):
            return pl.BlockSpec((tk, shape[1], shape[2]), lambda k: (k, 0, 0))

        # PARALLEL stencils: every K grid step is independent — telling
        # Mosaic so enables out-of-order scheduling of the block pipeline.
        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            )
        with jax.enable_x64(jax.config.jax_enable_x64 if interpret else False):
            results = pl.pallas_call(
                kernel,
                grid=(nkp // tk,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * len(scalar_names)
                + [bspec(main_shapes[n]) for n in main_stream]
                + [bspec(padded[n][1].shape) for n in strip_in]
                + [bspec(seed_shapes[n]) for n in seed_in],
                out_specs=[bspec(main_shapes[n]) for n in writes]
                + [bspec(padded[n][1].shape) for n in strip_out],
                out_shape=out_shapes,
                input_output_aliases=aliases,
                interpret=interpret,
                **kwargs,
            )(*scalar_args, *in_args)
        if not isinstance(results, (tuple, list)):
            results = (results,)
        out = {}
        for i, n in enumerate(writes):
            strip = (
                results[len(writes) + strip_out.index(n)]
                if n in strip_out
                else padded[n][1]
            )
            out[n] = (results[i], strip)
        return out

    def fn(arrays: dict[str, Any], scalars: dict[str, Any]) -> dict[str, Any]:
        padded = {n: encode(n, arrays[n]) for n in reads}
        results = call_padded(padded, scalars)
        return {n: decode(n, r, arrays[n]) for n, r in results.items()}

    fn.encode = encode
    fn.decode = decode
    fn.call_padded = call_padded
    fn.reads = tuple(reads)
    fn.writes = tuple(writes)
    fn.layout = "split"
    fn.strategy = "split"
    fn.geo = geo
    return fn


class _SplitEvaluator:
    """Evaluates PARALLEL GTIR over split (main, strip) blocks.

    Every statement is evaluated once per PART:
      part "main": value columns are the domain J range [0, nj)
      part "halo": value columns are the statement extent's packed J-halo
                   slots (width lo_s + hi_s, absent when the extent is 0)
    """

    def __init__(self, geo: _SplitGeometry, blocks_main, blocks_strip, scalars, k0, tk, nkp):
        self.geo = geo
        self.blocks_main = blocks_main
        self.blocks_strip = blocks_strip
        self.scalars = scalars
        self.k0 = k0
        self.tk = tk
        self.nkp = nkp
        self.nj = geo.nj
        self.nk = geo.domain[2]
        self.ni = geo.domain[0]
        # Live region of each TEMP value: row offset (absolute row of the
        # value's row 0) and first strip slot. Temp writes REBIND the value
        # at the statement's exact extent — no iota/where blending — and
        # reads index relative to the recorded region. Extent analysis
        # guarantees reads after a write stay inside that write's region.
        self._temp_row0: dict[str, int] = {}
        self._temp_s0: dict[str, int] = {}
        # Shifted-window cache across statements: keyed by the identity of
        # the source values, so a temp rebind (new object) invalidates
        # naturally. Saves re-concatenating the same dj window per consumer
        # statement (the per-statement expression memo cannot see this).
        self._windows: dict[Any, Any] = {}

    # -- bases -------------------------------------------------------------

    def _i_base(self, name: str) -> int:
        if name in self.geo.temps:
            return -self.geo.field_ext[name].i[0]
        return self.geo.origins[name][0]

    # -- halo slot layout for a statement extent ---------------------------

    @staticmethod
    def _stmt_slots(ext: Extent) -> list[int]:
        """Absolute J of each packed halo slot for this extent."""
        lo, hi = -ext.j[0], ext.j[1]
        return [j for j in range(-lo, 0)] + [j for j in range(0, hi)]

    def _slot_cols(self, ext: Extent):
        lo, hi = -ext.j[0], ext.j[1]
        return [ext.j[0] + s for s in range(lo)] + [self.nj + s for s in range(hi)]

    # -- execution ----------------------------------------------------------

    def run(self) -> None:
        for vloop in self.geo.stencil.vertical_loops:
            for section in vloop.sections:
                ks, ke = section.interval.resolve(self.nk)
                if ke <= ks:
                    continue
                for stmt in section.body:
                    self._exec(stmt, (ks, ke))

    def _exec(self, stmt: gtir.Stmt, k_interval) -> None:
        assert isinstance(stmt, gtir.Assign)
        ext = self.geo.analyzed.stmt_extents[stmt]
        for part in ("main", "halo"):
            if part == "halo" and ext.j == (0, 0):
                continue
            ctx = (ext, part)
            self._memo: dict[Any, Any] = {}
            value = self._broadcast(self.eval_expr(stmt.value, ctx), ctx)
            mask = self._full_mask(stmt, ctx, k_interval)
            self._write(stmt.target.name, value, mask, ctx)

    # -- shapes / masks -----------------------------------------------------

    def _shape(self, ctx):
        ext, part = ctx
        nrows = self.ni + ext.i[1] - ext.i[0]
        ncols = self.nj if part == "main" else (ext.j[1] - ext.j[0])
        return (self.tk, nrows, ncols)

    def _broadcast(self, value, ctx):
        import jax.numpy as jnp

        shape = self._shape(ctx)
        if getattr(value, "shape", None) == shape:
            return value
        return jnp.broadcast_to(value, shape)

    def _full_mask(self, stmt, ctx, k_interval):
        import jax.numpy as jnp
        from jax import lax

        mask = None
        if stmt.mask is not None:
            mask = self._broadcast(self.eval_expr(stmt.mask, ctx), ctx)
        if stmt.horizontal_masks:
            rmask = self._region_mask(stmt.horizontal_masks, ctx)
            mask = rmask if mask is None else jnp.logical_and(mask, rmask)
        ks_g, ke_g = k_interval
        if not (ks_g == 0 and ke_g == self.nk and self.nkp == self.nk):
            shape = self._shape(ctx)
            k_glob = lax.broadcasted_iota(jnp.int32, shape, 0) + self.k0
            kmask = jnp.logical_and(k_glob >= ks_g, k_glob < ke_g)
            mask = kmask if mask is None else jnp.logical_and(mask, kmask)
        return mask

    def _region_mask(self, hmasks, ctx):
        import jax.numpy as jnp
        from jax import lax

        ext, part = ctx
        shape = self._shape(ctx)
        ni, nj, _ = self.geo.domain
        i_rel = lax.broadcasted_iota(jnp.int32, shape, 1) + ext.i[0]
        if part == "halo":
            # Slot J positions are static: fold the J conditions into
            # per-slot booleans (pallas kernels cannot capture constant
            # arrays) and AND the traced I conditions per column.
            cols = self._slot_cols(ext)
            total = None
            for hm in hmasks:
                icond = jnp.ones(shape, dtype=jnp.bool_)
                if hm.i.start is not None:
                    icond = jnp.logical_and(icond, i_rel >= hm.i.start.resolve(ni))
                if hm.i.end is not None:
                    icond = jnp.logical_and(icond, i_rel < hm.i.end.resolve(ni))
                pieces = []
                for s, j in enumerate(cols):
                    ok = True
                    if hm.j.start is not None:
                        ok = ok and j >= hm.j.start.resolve(nj)
                    if hm.j.end is not None:
                        ok = ok and j < hm.j.end.resolve(nj)
                    col = icond[:, :, s : s + 1]
                    pieces.append(col if ok else jnp.zeros_like(col))
                cond = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=2)
                total = cond if total is None else jnp.logical_and(total, cond)
            return total
        j_rel = lax.broadcasted_iota(jnp.int32, shape, 2)
        total = None
        for hm in hmasks:
            cond = jnp.ones(shape, dtype=jnp.bool_)
            for rel, interval, size in ((i_rel, hm.i, ni), (j_rel, hm.j, nj)):
                if interval.start is not None:
                    cond = jnp.logical_and(cond, rel >= interval.start.resolve(size))
                if interval.end is not None:
                    cond = jnp.logical_and(cond, rel < interval.end.resolve(size))
            total = cond if total is None else jnp.logical_and(total, cond)
        return total

    # -- reads ----------------------------------------------------------------

    def _is_ref(self, name: str) -> bool:
        return name in self.geo.analyzed.field_infos

    def _main_full(self, name: str):
        block = self.blocks_main.get(name)
        if block is None:  # temp read before any write (masked first write)
            import jax.numpy as jnp

            ext = self.geo.field_ext[name]
            rows = self.ni + ext.i[1] - ext.i[0]
            return jnp.zeros((self.tk, rows, self.nj), self.geo.compute_dtypes[name])
        return block[...] if self._is_ref(name) else block

    def _strip_full(self, name: str):
        strip = self.blocks_strip.get(name)
        if strip is None:
            if name in self.geo.temps and self.geo.temp_strip_width(name):
                import jax.numpy as jnp

                ext = self.geo.field_ext[name]
                rows = self.ni + ext.i[1] - ext.i[0]
                w = self.geo.temp_strip_width(name)
                return jnp.zeros((self.tk, rows, w), self.geo.compute_dtypes[name])
            return None
        return strip[...] if self._is_ref(name) else strip

    def _main_cols_fullrows(self, name: str, dj: int):
        """Columns [dj, nj+dj) of `name`, ALL (region) rows.

        Mosaic's concatenate requires equal layout offsets on non-concat
        dims, so pieces are concatenated on full (offset-0) rows and the
        caller slices rows on the result."""
        import jax.numpy as jnp

        m = self._main_full(name)
        if dj == 0:
            return m
        lo_w = self.geo.lo_width(name) - self._temp_s0.get(name, 0)
        s = self._strip_full(name)
        if s is None or lo_w + min(dj, 0) < 0 or lo_w + max(dj, 0) > s.shape[2]:
            raise PallasUnsupported(f"split read of '{name}' outside its J strip")
        key = ("win", id(m), id(s), dj)
        hit = self._windows.get(key)
        if hit is not None:
            return hit[-1]
        if dj < 0:
            win = jnp.concatenate(
                [s[:, :, lo_w + dj : lo_w], m[:, :, : self.nj + dj]], axis=2
            )
        else:
            win = jnp.concatenate([m[:, :, dj:], s[:, :, lo_w : lo_w + dj]], axis=2)
        self._windows[key] = (m, s, win)  # keep sources alive for id keys
        return win

    def _col_fullrows(self, name: str, j: int):
        """One absolute-J column of `name`, ALL (region) rows."""
        if 0 <= j < self.nj:
            return self._main_full(name)[:, :, j : j + 1]
        lo_w = self.geo.lo_width(name)
        slot = (j + lo_w if j < 0 else j - self.nj + lo_w) - self._temp_s0.get(name, 0)
        strip = self._strip_full(name)
        if strip is None or not (0 <= slot < strip.shape[2]):
            raise PallasUnsupported(f"split read of '{name}' column {j} out of strip")
        return strip[:, :, slot : slot + 1]

    def _read(self, access: gtir.FieldAccess, ctx):
        import jax.numpy as jnp

        ext, part = ctx
        name = access.name
        di, dj, dk = access.offset
        assert dk == 0
        nrows = self.ni + ext.i[1] - ext.i[0]
        xi = self._i_base(name) + ext.i[0] + di - self._temp_row0.get(name, 0)
        if part == "main":
            window = self._main_cols_fullrows(name, dj)
        else:
            cols = [self._col_fullrows(name, j + dj) for j in self._slot_cols(ext)]
            window = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=2)
        if xi < 0 or xi + nrows > window.shape[1]:
            raise PallasUnsupported(
                f"split read of '{name}' outside its live row region"
            )
        if xi == 0 and nrows == window.shape[1]:
            return window
        return window[:, xi : xi + nrows, :]

    # -- writes ---------------------------------------------------------------

    def _read_current(self, name: str, ctx):
        return self._read(gtir.FieldAccess(name=name, offset=(0, 0, 0)), ctx)

    def _write(self, name: str, value, mask, ctx) -> None:
        import jax.numpy as jnp

        ext, part = ctx
        nrows = self.ni + ext.i[1] - ext.i[0]
        xi = self._i_base(name) + ext.i[0]
        is_field = name in self.geo.analyzed.field_infos
        # Fields store in their declared (possibly half) dtype; temps stay
        # in the COMPUTE dtype (f32 for half-precision stencils).
        dtype = np.dtype(
            self.geo.dtypes[name] if is_field else self.geo.compute_dtypes[name]
        )
        value = value.astype(dtype)

        if part == "main":
            if mask is not None:
                old = self._read_current(name, ctx)
                value = jnp.where(mask, value, old)
            if is_field:
                self.blocks_main[name][:, xi : xi + nrows, :] = value
            else:
                # Rebind at the statement's exact region (extent analysis
                # guarantees later reads stay inside it) — no blending.
                self.blocks_main[name] = value
                self._temp_row0[name] = xi
            return

        # halo part: the packed stmt slots map to ONE contiguous run of the
        # target's strip ([lo_w + ext.j0, lo_w + ext.j1): left slots end at
        # lo_w exactly where right slots begin), so the write is a single
        # range store (fields) or a region rebind (temps).
        lo_w = self.geo.lo_width(name)
        if mask is not None:
            old = self._read_current(name, ctx)
            value = jnp.where(mask, value, old)
        s0 = lo_w + ext.j[0]
        s1 = lo_w + ext.j[1]
        if is_field:
            strip = self.blocks_strip.get(name)
            if strip is None or s0 < 0 or s1 > strip.shape[2]:
                raise PallasUnsupported(f"halo write to '{name}' outside its strip")
            strip[:, xi : xi + nrows, s0:s1] = value
        else:
            self.blocks_strip[name] = value
            self._temp_s0[name] = s0

    # -- expressions ----------------------------------------------------------

    def eval_expr(self, expr: gtir.Expr, ctx):
        key = (repr(expr), ctx[1])
        hit = self._memo.get(key)
        if hit is None:
            hit = self._memo[key] = self._eval_expr(expr, ctx)
        return hit

    def _eval_expr(self, expr: gtir.Expr, ctx):
        import jax.numpy as jnp

        if isinstance(expr, gtir.Literal):
            return np.asarray(expr.value, dtype=expr.dtype)[()]
        if isinstance(expr, gtir.ScalarAccess):
            return self.scalars[expr.name][0, 0]
        if isinstance(expr, gtir.FieldAccess):
            return self._read(expr, ctx)
        if isinstance(expr, gtir.UnaryOp):
            v = self.eval_expr(expr.expr, ctx)
            if expr.op == gtir.UnaryOperator.NOT:
                return jnp.logical_not(v)
            if expr.op == gtir.UnaryOperator.NEG:
                return jnp.negative(v)
            return v
        if isinstance(expr, gtir.BinaryOp):
            from gt4py_tpu.cartesian.backend.evaluator import _apply_binop

            return _apply_binop(
                jnp, expr.op, self.eval_expr(expr.left, ctx), self.eval_expr(expr.right, ctx)
            )
        if isinstance(expr, gtir.TernaryOp):
            return jnp.where(
                self.eval_expr(expr.cond, ctx),
                self.eval_expr(expr.true_expr, ctx),
                self.eval_expr(expr.false_expr, ctx),
            )
        if isinstance(expr, gtir.NativeFuncCall):
            from gt4py_tpu.cartesian.backend.evaluator import _native_impls, _NamespaceOps

            impls = _native_impls(_NamespaceOps("jax"))
            return impls[expr.func](*[self.eval_expr(a, ctx) for a in expr.args])
        if isinstance(expr, gtir.Cast):
            # half-dtype casts land on the f32 compute dtype (storage-only
            # halves; see _SplitGeometry.compute_dtypes)
            _dt = np.dtype(expr.dtype)
            if self.geo.half_compute:
                from gt4py_tpu.core.definitions import HALF_FLOAT_DTYPES as _H

                if _dt in _H:
                    _dt = np.dtype(np.float32)
            return jnp.asarray(self.eval_expr(expr.expr, ctx)).astype(_dt)
        if isinstance(expr, gtir.IteratorAccess):
            from jax import lax

            # Absolute K of each block row (int32: no 64-bit on Mosaic).
            return lax.broadcasted_iota(jnp.int32, self._shape(ctx), 0) + self.k0
        raise PallasUnsupported(type(expr).__name__)
