"""Pallas TPU kernel generation for GTIR stencils.

This is the fused-kernel path the reference reaches with generated CUDA
(gt:gpu, /root/reference/src/gt4py/cartesian/backend/gtcpp_backend.py:169)
and the BASELINE north star describes for TPU. The internal layout is
K-leading ``(K, I, J)``: J rides the 128-wide lanes, I the sublanes,
sequential-K iteration walks the unconstrained major axis. Two kernel
strategies:

**Plane strategy** (PARALLEL-only stencils, no K-offset reads — the hdiff/
copy/horizontal class): grid over K planes only; every block holds the FULL
(halo-extended) I/J plane so horizontal halos never cross a block boundary,
and Pallas' automatic pipeline double-buffers the HBM→VMEM plane streams
against compute. This measured 100% of the v5e HBM roofline on hdiff at
256x256x80 (vs 24% for the fused XLA path). Temporaries live in VMEM
scratch (the role of the reference's IJ-cache pass,
oir_optimizations/caches.py:44); K-interval sections mask rows against the
block's global K range.

**Tiled strategy** (sequential K loops, K offsets): the grid tiles I
(sublane-aligned) and J (lane-quantized halos); each grid instance DMAs
halo-extended field windows HBM→VMEM manually (halo overlap is not
expressible with automatic BlockSpec blocking), computes every unit in
VMEM, and DMAs written tiles back. FORWARD/BACKWARD sections run as
``fori_loop`` over the block's K rows with all state in VMEM (the K-cache
role, caches.py:92).

The Mosaic compiler behind this environment's remote-compile tunnel
rejects some kernels at large block shapes with an opaque crash; block
sizes are therefore capped at empirically safe values and the plane
strategy exposes the K-block size for a compile-probe ladder.

Unsupported features (variable/absolute K offsets, data dimensions,
GlobalTables, non-IJK fields, while loops, 64-bit dtypes on hardware) raise
``PallasUnsupported``; the backend falls back to the XLA-traced path.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from gt4py_tpu.cartesian import gtir
from gt4py_tpu.cartesian.definitions import AccessKind, Extent
from gt4py_tpu.cartesian.passes.pipeline import AnalyzedStencil


class PallasUnsupported(Exception):
    pass


# Cap for the tiled strategy's per-instance VMEM blocks: leaves room for
# Mosaic's value stack and the pipeline's double buffers below the
# 128 MB VMEM of v5e/v5p.
_VMEM_BUDGET = 24 * 1024 * 1024
_LANE = 128
_SUBLANE = 8


#: widest GlobalTable (total entries) served natively via one-hot lookup
#: (this Mosaic toolchain has no N-D gather — "Only 2D gather is supported").
#: Measured on v5e at 256x256x80: one-hot scales linearly (~3.6 us per
#: entry per step — T=64: 235 us, T=128: 460 us, T=256: 1.38 ms) and
#: beats XLA's scalar-gather fallback (43.4 ms at T=256) by ~30x; compile
#: time grows steeply above 256 (140 s at T=256, T=512 exceeds a 5-min
#: budget), hence the cap.
_MAX_TABLE_ONEHOT = 256
#: widest data-dimension expansion (streams per field) the plane kernels
#: carry; dynamic data-index reads cost one select per stream (statically
#: indexed reads — the unrolled vector/matmul form — cost nothing extra,
#: and a 3x3 matrix field needs 9).
_MAX_DATA_STREAMS = 16

#: Horizontal-region kernels on the live Mosaic toolchain WEDGE the chip
#: (on-device infinite execution until the client dies) when BOTH horizontal
#: extents are below 32 — probed round 3 (tests/tpu_tests/probe_regions.py):
#: wedge at (8,9,8) and (24,24,8); clean at (24,32), (32,24), (32,32),
#: (33,33), (40,33), (64,64) and (256,256,80) across the plane/split/tiled
#: strategies. Region stencils with max(ni, nj) below this floor serve
#: through the XLA path instead.
_REGION_HW_FLOOR = 32


def _has_region_masks(analyzed: AnalyzedStencil) -> bool:
    """Any statement (incl. nested While bodies) carries a horizontal mask."""

    def _nested(stmts):
        for s in stmts:
            yield s
            if isinstance(s, gtir.While):
                yield from _nested(s.body)

    return any(
        getattr(stmt, "horizontal_masks", ())
        for _, _, top in analyzed.stencil.walk_stmts()
        for stmt in _nested([top])
    )


def _check_supported(
    analyzed: AnalyzedStencil,
    *,
    interpret: bool,
    allow_while: bool = False,
    allow_k_gather: bool = False,
    allow_tables: bool = False,
    allow_lower_dims: bool = False,
    allow_data_dims: bool = False,
) -> None:
    from gt4py_tpu import eve

    if not interpret:
        # Mosaic has no 64-bit types: fall back to the XLA path for f64/i64
        # stencils (use literal_*_precision=32 + 32-bit fields on TPU).
        for p in analyzed.stencil.params:
            dtype = getattr(p, "dtype", None)
            if dtype is not None and np.dtype(dtype).itemsize == 8:
                raise PallasUnsupported(f"64-bit dtype on field '{p.name}'")
        for t in analyzed.stencil.temporaries:
            if t.dtype is not None and np.dtype(t.dtype).itemsize == 8:
                raise PallasUnsupported(f"64-bit temporary '{t.name}'")
    for p in analyzed.stencil.params:
        if isinstance(p, gtir.GlobalTableDecl):
            if not allow_tables:
                raise PallasUnsupported("GlobalTable")
            if int(np.prod(p.shape)) > _MAX_TABLE_ONEHOT:
                raise PallasUnsupported(
                    f"GlobalTable '{p.name}' too large for one-hot lookup"
                )
        if isinstance(p, gtir.FieldDecl):
            if p.data_dims:
                # Each flat data index becomes one kernel stream; dynamic
                # reads select over all of them, so cap the expansion.
                if not allow_data_dims:
                    raise PallasUnsupported("data dimensions")
                if int(np.prod(p.data_dims)) > _MAX_DATA_STREAMS:
                    raise PallasUnsupported(
                        f"data dimensions of '{p.name}' too large"
                    )
            if p.dimensions != (True, True, True) and not allow_lower_dims:
                raise PallasUnsupported("non-IJK field")
    for t in analyzed.stencil.temporaries:
        if t.data_dims:
            raise PallasUnsupported("data-dimension temporary")
    for _, _, top in analyzed.stencil.walk_stmts():
        stmt = top
        if isinstance(stmt, gtir.While) and not allow_while:
            raise PallasUnsupported("while loop")
        if isinstance(stmt, gtir.Assign) and stmt.target.data_index:
            if not all(
                isinstance(e, gtir.Literal) for e in stmt.target.data_index
            ):
                raise PallasUnsupported("dynamic data index write")
        from gt4py_tpu.cartesian.passes.extents import iter_writes as _iterw

        for wacc in _iterw(stmt):
            if wacc.offset[2] != 0 or wacc.koffset is not None:
                # K-offset writes need the whole K column mutable per
                # level — the kernel strategies stream planes/carries.
                raise PallasUnsupported("K-offset write")
        for node in eve.walk_values(stmt):
            if isinstance(node, gtir.FieldAccess):
                if (
                    node.koffset is not None or node.abs_k is not None
                ) and not allow_k_gather:
                    raise PallasUnsupported("variable/absolute K offset")
                if node.data_index:
                    is_table = (
                        node.name in analyzed.field_infos
                        and not analyzed.field_infos[node.name].axes
                    )
                    if is_table:
                        if not allow_tables:
                            raise PallasUnsupported("GlobalTable data index")
                    elif not allow_data_dims:
                        raise PallasUnsupported("data index")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _table_2d(shape: tuple[int, ...]) -> tuple[int, int]:
    """SMEM layout for a GlobalTable: 2-D, minor = last table dim."""
    if len(shape) == 1:
        return (1, shape[0])
    lead = 1
    for s in shape[:-1]:
        lead *= s
    return (lead, shape[-1])


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


class _Plan:
    """Static kernel plan for one (domain, origins) specialization."""

    def __init__(self, analyzed: AnalyzedStencil, domain, origins):
        self.analyzed = analyzed
        self.stencil = analyzed.stencil
        self.domain = domain
        self.origins = dict(origins)
        ni, nj, nk = domain

        self.field_ext: dict[str, Extent] = {}
        self.reads: list[str] = []
        self.writes: list[str] = []
        self.table_shapes: dict[str, tuple[int, ...]] = {}
        for name, info in analyzed.field_infos.items():
            if info.access == AccessKind.NONE:
                continue
            if not info.axes:  # GlobalTable: SMEM operand, not a stream
                self.table_shapes[name] = tuple(info.data_dims)
                continue
            self.field_ext[name] = analyzed.field_extents.get(name, Extent.zeros())
            self.reads.append(name)  # all accessed fields get DMA'd in
            if info.access & AccessKind.WRITE:
                self.writes.append(name)
        self.temps = {t.name: t for t in self.stencil.temporaries}
        for t in self.stencil.temporaries:
            self.field_ext[t.name] = analyzed.field_extents.get(t.name, Extent.zeros())

        self.sequential = any(
            vl.loop_order != gtir.LoopOrder.PARALLEL for vl in self.stencil.vertical_loops
        )
        # Multi-section loops need row masking under K blocking; supported.

        # Static K-offset reads address neighbor rows INSIDE the block;
        # the K window only budgets the field's domain-escaping extent
        # (ext.k), so K blocking would read past the window — keep the
        # whole K range in one block when any static K offset exists.
        # Variable/absolute K reads gather over the whole domain K range,
        # so they force full-K blocks too.
        from gt4py_tpu import eve

        self.has_k_offset_reads = any(
            isinstance(node, gtir.FieldAccess)
            and (
                node.offset[2] != 0
                or node.koffset is not None
                or node.abs_k is not None
            )
            for _, _, stmt in self.stencil.walk_stmts()
            for node in eve.walk_values(stmt)
        )

        # Per-field paddings so DMA offsets/shapes are (8, 128)-aligned.
        self.pad_i_front = {n: (-origins[n][0]) % _SUBLANE for n in self.reads}

        # J handling: halo quantization to 128-lane tiles is expensive, so
        # prefer "full rows" (one J tile spanning the whole padded J extent,
        # DMA start 0) whenever VMEM allows; fall back to lane-tiled J.
        self.njb_full = _round_up(
            max(
                (origins[n][1] + nj + self.field_ext[n].j[1] for n in self.reads),
                default=nj,
            ),
            _LANE,
        )
        tk_full = self.sequential or nk <= 8 or self.has_k_offset_reads
        ti0 = _SUBLANE
        tk0 = nk if tk_full else min(nk, 8)

        self.j_full = True
        self.pad_j_front = {n: 0 for n in self.reads}
        if self._vmem_bytes(ti0, self.njb_full, tk0) > _VMEM_BUDGET:
            self.j_full = False
            for n in self.reads:
                ext = self.field_ext[n]
                n_lo = _cdiv(max(0, -ext.j[0]), _LANE)
                self.pad_j_front[n] = (-origins[n][1]) % _LANE + _LANE * n_lo

        tj0 = self.njb_full if self.j_full else min(_round_up(nj, _LANE), _LANE)
        if self._vmem_bytes(ti0, tj0, tk0) > _VMEM_BUDGET:
            raise PallasUnsupported("VMEM budget exceeded for minimal tile")
        ti, tj, tk = ti0, tj0, tk0
        # Greedy growth: I (cheap sublane halos), then K, then J.
        while ti * 2 <= _round_up(ni, _SUBLANE) and self._vmem_bytes(ti * 2, tj, tk) <= _VMEM_BUDGET:
            ti *= 2
        if not tk_full:
            while tk * 2 <= nk and self._vmem_bytes(ti, tj, tk * 2) <= _VMEM_BUDGET:
                tk *= 2
        if not self.j_full:
            while tj * 2 <= _round_up(nj, _LANE) and self._vmem_bytes(ti, tj * 2, tk) <= _VMEM_BUDGET:
                tj *= 2
        self.ti, self.tj, self.tk = ti, tj, tk
        self.k_blocked = tk < nk
        grid_j = 1 if self.j_full else _cdiv(nj, tj)
        self.grid = (
            (_cdiv(nk, tk), _cdiv(ni, ti), grid_j)
            if self.k_blocked
            else (_cdiv(ni, ti), grid_j)
        )

    # window helpers ------------------------------------------------------

    def _i_window(self, name: str, ti: int) -> tuple[int, int]:
        """(m, size): block row of unit-extent origin shift and window size."""
        ext = self.field_ext.get(name, Extent.zeros())
        m = ext.i[0] % _SUBLANE
        size = _round_up(ti + ext.i[1] - ext.i[0] + m, _SUBLANE)
        return m, size

    def _j_window(self, name: str, tj: int) -> tuple[int, int, int]:
        """(n_lo tiles, n_hi tiles, window size) for the J axis."""
        if getattr(self, "j_full", False):
            return 0, 0, tj
        ext = self.field_ext.get(name, Extent.zeros())
        n_lo = _cdiv(max(0, -ext.j[0]), _LANE)
        n_hi = _cdiv(max(0, ext.j[1]), _LANE)
        return n_lo, n_hi, tj + _LANE * (n_lo + n_hi)

    def _k_window(self, name: str, tk: int) -> tuple[int, int]:
        """(lo halo, window size) for the K axis (unconstrained alignment)."""
        ext = self.field_ext.get(name, Extent.zeros())
        return -ext.k[0], tk + ext.k[1] - ext.k[0]

    def _block_shape(self, name: str, ti: int, tj: int, tk: int):
        _, isize = self._i_window(name, ti)
        _, _, jsize = self._j_window(name, tj)
        _, ksize = self._k_window(name, tk)
        return (ksize, isize, jsize)

    def _vmem_bytes(self, ti: int, tj: int, tk: int) -> int:
        total = 0
        for name in list(self.field_ext):
            shape = self._block_shape(name, ti, tj, tk)
            if name in self.temps:
                dtype = self.temps[name].dtype or np.float64
            else:
                dtype = self.analyzed.field_infos[name].dtype
            total += int(np.prod(shape)) * np.dtype(dtype).itemsize
        return total


def _race_parallel_vs_staged(analyzed, domain, origins, parallel_variant, tk):
    """Time the chosen split/plane kernel against the staged full-plane
    K-walk for an all-PARALLEL stencil and persist the winner.

    Motivation (measured on the live device): the staged walk holds the
    WHOLE (1, I, J) plane in VMEM per grid step and streams planes at the
    pipeline's full rate — hdiff 256x256x80 f32 runs 60us/step vs 90-97us
    for the lane-split/tiled kernels. Which wins is device- and
    shape-dependent, so it is raced once and cached like the tk probes."""
    import json

    from gt4py_tpu.cartesian.caching import GT_CACHE_ROOT
    from gt4py_tpu.cartesian.gtir_pretty import pretty
    from gt4py_tpu.eve.utils import content_hash

    time_probes = os.environ.get("GT4PY_PALLAS_PROBE_TIMING", "1") not in (
        "0", "", "false"
    )
    if not time_probes:
        return parallel_variant
    key = content_hash(
        "strategy-race-v2",
        _KERNEL_REV,
        pretty(analyzed.stencil),
        domain,
        sorted(origins.items()),
        parallel_variant,
        tk,
    )
    if key in _plane_tk_cache:
        return _plane_tk_cache[key]
    cache_dir = os.path.join(GT_CACHE_ROOT, "pallas_tk")
    cache_path = os.path.join(cache_dir, f"{key}.json")
    try:
        with open(cache_path) as f:
            choice = str(json.load(f)["strategy"])
        _plane_tk_cache[key] = choice
        return choice
    except (OSError, ValueError, KeyError):
        pass
    choice = parallel_variant
    try:
        t_par = _probe_plane_time(analyzed, domain, origins, tk, parallel_variant)
        t_staged = _probe_plane_time(analyzed, domain, origins, None, "staged")
        if t_staged < t_par:
            choice = "staged"
    except Exception:
        pass
    _plane_tk_cache[key] = choice
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = cache_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"strategy": choice}, f)
        os.replace(tmp, cache_path)
    except OSError:
        pass
    return choice


def build_pallas_fn(
    analyzed: AnalyzedStencil,
    domain: tuple[int, int, int],
    origins: dict[str, tuple[int, int, int]],
    *,
    interpret: bool = False,
):
    """Build fn(arrays: dict[name -> (I, J, K) jnp array], scalars) -> dict
    of written arrays, executing the stencil as one Pallas kernel.

    Dispatch: fused plane strategy (all-PARALLEL, no K offsets) → staged
    per-loop plane strategy (sequential loops / static K offsets,
    pallas_seq.py) → tiled manual-DMA strategy.
    """
    ni, nj, _nk = domain
    if not interpret and (nj < 16 or ni < 8):
        # Hardware floor: Mosaic kernels at sub-tile domains have WEDGED
        # the chip (observed: a region kernel at (8, 9, 8) runs forever
        # on-device until the client dies). Tiny domains are
        # dispatch-bound anyway — the fused XLA path serves them.
        raise PallasUnsupported(
            f"domain {domain} below the hardware kernel floor (16 J / 8 I)"
        )
    if (
        not interpret
        and max(ni, nj) < _REGION_HW_FLOOR
        and os.environ.get("GT4PY_PALLAS_REGIONS_ON_HW", "0") != "1"
        and _has_region_masks(analyzed)
    ):
        # Mosaic wedge hazard at small region-masked domains — see
        # _REGION_HW_FLOOR. GT4PY_PALLAS_REGIONS_ON_HW=1 lifts the gate
        # for bounded probes only (tests/tpu_tests/probe_regions.py).
        raise PallasUnsupported(
            f"horizontal regions at domain {domain}: Mosaic wedge hazard "
            f"below the {_REGION_HW_FLOOR}-point floor"
        )
    if _plane_eligible(analyzed, domain):
        from gt4py_tpu.cartesian.backend import pallas_seq, pallas_split

        par_variant = None
        par_tk = None
        if (
            os.environ.get("GT4PY_PALLAS_SPLIT", "1") not in ("0", "", "false")
            and pallas_split.split_eligible(analyzed, domain)
        ):
            # Lane-aligned main blocks + packed J-halo strips: measured
            # 119us -> ~90us on hdiff 256x256x80 (VPU-bound at this shape).
            try:
                par_tk = select_plane_tk(
                    analyzed, domain, origins, interpret=interpret, variant="split"
                )
                par_variant = "split"
            except PallasUnsupported:
                pass
        if par_variant is None:
            par_tk = select_plane_tk(analyzed, domain, origins, interpret=interpret)
            par_variant = "plane"

        # Race the chosen split/plane kernel against the staged full-plane
        # K-walk (holds the whole (1, I, J) plane in VMEM per grid step;
        # measured hdiff 96.5us -> 60us on the live device). Winner cached.
        if (
            not interpret
            and pallas_seq.staged_eligible(analyzed, interpret=False)
            and _staged_probe_ok(analyzed, domain, origins)
            and _race_parallel_vs_staged(
                analyzed, domain, origins, par_variant, par_tk
            )
            == "staged"
        ):
            return pallas_seq.build_staged_fn(
                analyzed, domain, origins, interpret=False
            )

        if par_variant == "split":
            try:
                fn = pallas_split.build_plane_split_fn(
                    analyzed, domain, origins, tk=par_tk, interpret=interpret
                )
                if interpret:
                    _abstract_trace(fn, analyzed, domain, origins)
                return fn
            except PallasUnsupported:
                par_tk = select_plane_tk(
                    analyzed, domain, origins, interpret=interpret
                )
        return build_plane_fn(
            analyzed, domain, origins, tk=par_tk, interpret=interpret
        )
    from gt4py_tpu.cartesian.backend import pallas_seq

    if pallas_seq.staged_eligible(analyzed, interpret=interpret):
        if interpret:
            # The kernel body is traced lazily (at the first call, inside
            # jax.jit); PallasUnsupported raised THERE must still fall back
            # to the tiled strategy, so validate the trace eagerly. On
            # hardware the AOT probe below plays this role.
            try:
                fn = pallas_seq.build_staged_fn(
                    analyzed, domain, origins, interpret=True
                )
                _abstract_trace(fn, analyzed, domain, origins)
                return fn
            except PallasUnsupported:
                pass
        elif _staged_probe_ok(analyzed, domain, origins):
            try:
                return pallas_seq.build_staged_fn(
                    analyzed, domain, origins, interpret=False
                )
            except PallasUnsupported:
                pass
    return _build_tiled_fn(analyzed, domain, origins, interpret=interpret)


def _probe_arg_shapes(analyzed, domain, origins):
    """Abstract (arrays, scalars) argument pytrees for probing a built fn."""
    import jax

    ni, nj, nk = domain
    shapes = {}
    for name, info in analyzed.field_infos.items():
        if info.access == AccessKind.NONE:
            continue
        if not info.axes:  # GlobalTable
            shapes[name] = jax.ShapeDtypeStruct(tuple(info.data_dims), np.dtype(info.dtype))
            continue
        ext = analyzed.field_extents.get(name, Extent.zeros())
        oi, oj, ok = origins[name][:3]
        bi, bj, bk = info.domain_mask
        dims = []
        if bi:
            dims.append(oi + ni + max(0, ext.i[1]))
        if bj:
            dims.append(oj + nj + max(0, ext.j[1]))
        if bk:
            dims.append(ok + nk)
        dims += list(info.data_dims)
        shapes[name] = jax.ShapeDtypeStruct(tuple(dims), np.dtype(info.dtype))
    scalars = {
        n: jax.ShapeDtypeStruct((), np.dtype(i.dtype))
        for n, i in analyzed.parameter_infos.items()
        if i.access != AccessKind.NONE
    }
    return shapes, scalars


def _abstract_trace(fn, analyzed, domain, origins) -> None:
    """Trace fn on abstract arguments (kernel bodies trace at bind time, so
    evaluator-raised PallasUnsupported surfaces here, without execution)."""
    import jax

    shapes, scalars = _probe_arg_shapes(analyzed, domain, origins)
    jax.eval_shape(fn, shapes, scalars)


def _transient_probe_error(e: Exception) -> bool:
    """Heuristic: probe failures from the remote-compile transport (tunnel
    outages) must NOT be persisted as negative results — they would pin the
    stencil to a slower strategy until the cache is cleared manually."""
    text = f"{type(e).__name__}: {e}".lower()
    return any(
        marker in text
        for marker in (
            "connection",
            "unavailable",
            "deadline",
            "timed out",
            "timeout",
            "remote500",
            "socket",
            "broken pipe",
            "reset by peer",
            "temporarily",
        )
    )


def _staged_probe_ok(analyzed, domain, origins) -> bool:
    """AOT-probe the staged strategy on hardware (the remote Mosaic
    compiler rejects some kernels opaquely); cached persistently."""
    import json

    from gt4py_tpu.cartesian.caching import GT_CACHE_ROOT
    from gt4py_tpu.eve.utils import content_hash

    key = content_hash(
        "staged", repr(analyzed.stencil), domain, sorted(origins.items())
    )
    if key in _plane_tk_cache:
        return bool(_plane_tk_cache[key])
    cache_dir = os.path.join(GT_CACHE_ROOT, "pallas_tk")
    cache_path = os.path.join(cache_dir, f"{key}.json")
    try:
        with open(cache_path) as f:
            ok = bool(json.load(f)["ok"])
        _plane_tk_cache[key] = ok
        return ok
    except (OSError, ValueError, KeyError):
        pass

    ok = _probe_staged_compile(analyzed, domain, origins)
    if ok is None:
        # Transient transport failure: settle on the tiled path for this
        # process but re-probe on the next start.
        _plane_tk_cache[key] = False
        return False
    _plane_tk_cache[key] = ok
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = cache_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"ok": ok}, f)
        os.replace(tmp, cache_path)
    except OSError:
        pass
    return ok


def _probe_staged_compile(analyzed, domain, origins) -> bool | None:
    """True: compiles. False: deterministic rejection (persistable).
    None: transient transport failure (do not persist)."""
    import jax

    from gt4py_tpu.cartesian.backend import pallas_seq

    shapes, scalars = _probe_arg_shapes(analyzed, domain, origins)
    try:
        fn = pallas_seq.build_staged_fn(analyzed, domain, origins, interpret=False)
        jax.jit(lambda arrays, sc: fn(arrays, sc)).lower(shapes, scalars).compile()
        return True
    except PallasUnsupported:
        return False
    except Exception as e:
        return None if _transient_probe_error(e) else False


def _build_tiled_fn(
    analyzed: AnalyzedStencil,
    domain: tuple[int, int, int],
    origins: dict[str, tuple[int, int, int]],
    *,
    interpret: bool = False,
):
    """Tiled manual-DMA kernel (see module docstring)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Pin field operands to HBM: with the unconstrained ANY space, XLA's
    # memory-space assignment may try to stage whole (K, I, J) arrays in
    # VMEM around the call and exceed the scoped-VMEM limit at production
    # shapes (the kernel DMAs its own halo windows, so VMEM staging of the
    # full operands is never wanted).
    _field_space = getattr(pltpu.MemorySpace, "HBM", pl.ANY) if not interpret else pl.ANY

    _check_supported(
        analyzed,
        interpret=interpret,
        allow_while=True,
        allow_k_gather=True,
        allow_tables=True,
    )
    ni, nj, nk = domain
    plan = _Plan(analyzed, domain, origins)
    TI, TJ, TK = plan.ti, plan.tj, plan.tk
    reads = plan.reads
    writes = plan.writes
    tables = sorted(plan.table_shapes)
    scalar_names = [
        n for n, i in analyzed.parameter_infos.items() if i.access != AccessKind.NONE
    ]
    dtypes = {
        n: (
            analyzed.field_infos[n].dtype
            if n in analyzed.field_infos
            else (plan.temps[n].dtype or np.float64)
        )
        for n in plan.field_ext
    }

    def kernel(*refs):
        pos = 0
        sref = {n: refs[pos + i] for i, n in enumerate(scalar_names)}
        pos += len(scalar_names)
        tref = {n: refs[pos + i] for i, n in enumerate(tables)}
        pos += len(tables)
        in_refs = {n: refs[pos + i] for i, n in enumerate(reads)}
        pos += len(reads)
        out_refs = {n: refs[pos + i] for i, n in enumerate(writes)}
        pos += len(writes)
        blocks = {n: refs[pos + i] for i, n in enumerate(plan.field_ext)}
        pos += len(plan.field_ext)
        in_sems = refs[pos]
        out_sems = refs[pos + 1]

        if plan.k_blocked:
            k0 = pl.program_id(0) * TK
            i0 = pl.program_id(1) * TI
            j0 = pl.program_id(2) * TJ
        else:
            k0 = 0
            i0 = pl.program_id(0) * TI
            j0 = pl.program_id(1) * TJ

        dmas = []
        for idx, name in enumerate(reads):
            oi, oj, ok = plan.origins[name]
            oi_p = oi + plan.pad_i_front[name]
            oj_p = oj + plan.pad_j_front[name]
            m, iwin = plan._i_window(name, TI)
            n_lo, _, jwin = plan._j_window(name, TJ)
            k_lo, kwin = plan._k_window(name, TK)
            ext = plan.field_ext[name]
            j_start = 0 if plan.j_full else j0 + oj_p - _LANE * n_lo
            src = in_refs[name].at[
                pl.ds(ok + k0 + ext.k[0], kwin),
                pl.ds(i0 + oi_p + ext.i[0] - m, iwin),
                pl.ds(j_start, jwin),
            ]
            dma = pltpu.make_async_copy(src, blocks[name], in_sems.at[np.int32(idx)])
            dma.start()
            dmas.append(dma)
        for dma in dmas:
            dma.wait()

        ev = _BlockEvaluator(plan, blocks, sref, k0, i0, j0, tables=tref)
        ev.run()

        out_dmas = []
        for idx, name in enumerate(writes):
            oi, oj, ok = plan.origins[name]
            oi_p = oi + plan.pad_i_front[name]
            oj_p = oj + plan.pad_j_front[name]
            m, _ = plan._i_window(name, TI)
            n_lo, _, _ = plan._j_window(name, TJ)
            k_lo, kwin = plan._k_window(name, TK)
            ext = plan.field_ext[name]
            # Tile interior: K rows of the block's domain range, I rows at
            # m - ext.i[0] (8-aligned: m ≡ ext.i[0] mod 8), J cols at the
            # lane-tile boundary.
            if plan.j_full:
                # Single J tile: write whole rows (non-domain columns hold
                # the DMA'd-in original values).
                j_src, j_dst, j_len = 0, 0, TJ
            else:
                j_src, j_dst, j_len = _LANE * n_lo, j0 + oj_p, TJ
            src = blocks[name].at[
                pl.ds(0, kwin),
                pl.ds(m - ext.i[0], TI),
                pl.ds(j_src, j_len),
            ]
            dst = out_refs[name].at[
                pl.ds(ok + k0 + ext.k[0], kwin),
                pl.ds(i0 + oi_p, TI),
                pl.ds(j_dst, j_len),
            ]
            dma = pltpu.make_async_copy(src, dst, out_sems.at[np.int32(idx)])
            dma.start()
            out_dmas.append(dma)
        for dma in out_dmas:
            dma.wait()

    def fn(arrays: dict[str, Any], scalars: dict[str, Any]) -> dict[str, Any]:
        # ---- transpose + pad to aligned (K, I, J) ------------------------
        padded = {}
        grid_i = plan.grid[1] if plan.k_blocked else plan.grid[0]
        grid_j = plan.grid[2] if plan.k_blocked else plan.grid[1]
        grid_k = plan.grid[0] if plan.k_blocked else 1
        for n in reads:
            a = arrays[n]
            kf = jnp.transpose(a, (2, 0, 1))
            oi, oj, ok = plan.origins[n]
            ext = plan.field_ext[n]
            fi = plan.pad_i_front[n]
            fj = plan.pad_j_front[n]
            m, iwin = plan._i_window(n, TI)
            n_lo, n_hi, jwin = plan._j_window(n, TJ)
            k_lo, kwin = plan._k_window(n, TK)
            # Capacity so the last tile's DMA window stays in bounds:
            # DMA start + window size <= padded extent, per axis.
            need_k = (grid_k - 1) * TK + ok + ext.k[0] + kwin
            need_i = (grid_i - 1) * TI + (oi + fi) + ext.i[0] - m + iwin
            if plan.j_full:
                need_j = jwin
            else:
                need_j = (grid_j - 1) * TJ + (oj + fj) - _LANE * n_lo + jwin
            bk = max(0, need_k - kf.shape[0])
            cur_i = fi + kf.shape[1]
            bi = _round_up(max(need_i, cur_i) + _SUBLANE, _SUBLANE) - cur_i
            cur_j = fj + kf.shape[2]
            bj = _round_up(max(need_j, cur_j), _LANE) - cur_j
            padded[n] = jnp.pad(kf, ((0, bk), (fi, bi), (fj, bj)))

        scalar_args = [jnp.asarray(scalars[n]).reshape(1, 1) for n in scalar_names]
        table_args = [
            jnp.asarray(arrays[n]).reshape(_table_2d(plan.table_shapes[n]))
            for n in tables
        ]
        in_args = [padded[n] for n in reads]
        out_shapes = [jax.ShapeDtypeStruct(padded[n].shape, padded[n].dtype) for n in writes]
        n_lead = len(scalar_names) + len(tables)
        aliases = {n_lead + reads.index(n): wi for wi, n in enumerate(writes)}
        scratch_shapes = [
            pltpu.VMEM(plan._block_shape(n, TI, TJ, TK), dtypes[n])
            for n in plan.field_ext
        ] + [
            pltpu.SemaphoreType.DMA((max(len(reads), 1),)),
            pltpu.SemaphoreType.DMA((max(len(writes), 1),)),
        ]

        # Trace the kernel with x64 OFF: the framework enables jax_enable_x64
        # globally for NumPy dtype parity, but x64 trace context makes the
        # remote Mosaic compiler crash on otherwise-valid kernels (verified
        # by compiling the identical kernel under both flags). All kernel
        # dtypes are explicit, so the scope only affects lowering internals.
        with jax.enable_x64(jax.config.jax_enable_x64 if interpret else False):
            results = pl.pallas_call(
                kernel,
                grid=plan.grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                * (len(scalar_names) + len(tables))
                + [pl.BlockSpec(memory_space=_field_space)] * len(reads),
                out_specs=[pl.BlockSpec(memory_space=_field_space)] * len(writes),
                out_shape=out_shapes,
                scratch_shapes=scratch_shapes,
                input_output_aliases=aliases,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=_VMEM_BUDGET + 4 * 1024 * 1024,
                ),
                interpret=interpret,
            )(*scalar_args, *table_args, *in_args)
        if len(writes) == 1 and not isinstance(results, (tuple, list)):
            results = (results,)

        out = {}
        for n, r in zip(writes, results):
            fi = plan.pad_i_front[n]
            fj = plan.pad_j_front[n]
            kf_shape = (arrays[n].shape[2], arrays[n].shape[0], arrays[n].shape[1])
            r = r[: kf_shape[0], fi : fi + kf_shape[1], fj : fj + kf_shape[2]]
            out[n] = jnp.transpose(r, (1, 2, 0))
        return out

    fn.strategy = "tiled"
    return fn


class _BlockEvaluator:
    """Evaluates the lowered GTIR over VMEM blocks in (K, I, J) layout.

    Block coordinates for field f: tile point (i, j, k) (relative to the
    tile's (i0, j0, k0)) sits at block
    ``[k + k_lo, i + m - ext.i[0], j + LANE*n_lo + (uext-adjusted)]``.
    Under K blocking, K-interval sections mask rows against the block's
    global K range (k0 is traced).
    """

    def __init__(self, plan: _Plan, blocks, scalars, k0, i0, j0, tables=None, refs=None):
        self.plan = plan
        self.blocks = blocks
        self.scalars = scalars
        self.tables = tables or {}
        self.k0 = k0
        self.i0 = i0
        self.j0 = j0
        self.nk = plan.domain[2]
        #: names whose blocks are MUTABLE REFS (vs traced values)
        self._refs = set(refs) if refs is not None else set(plan.field_ext)
        #: while-loop body evaluation: all writes go to carried VALUES
        self._value_mode = False

    def _i_base(self, name: str) -> int:
        ext = self.plan.field_ext[name]
        m, _ = self.plan._i_window(name, self.plan.ti)
        return m - ext.i[0]

    def _j_base(self, name: str) -> int:
        if name in self.plan.temps:
            return -self.plan.field_ext[name].j[0]
        if self.plan.j_full:
            # Block cols == array cols: domain j=0 sits at the J origin.
            return self.plan.origins[name][1]
        n_lo, _, _ = self.plan._j_window(name, self.plan.tj)
        return _LANE * n_lo

    def _k_base(self, name: str) -> int:
        return -self.plan.field_ext[name].k[0]

    def run(self) -> None:
        from jax import lax

        for vloop in self.plan.stencil.vertical_loops:
            for section in vloop.sections:
                ks, ke = section.interval.resolve(self.nk)
                if ke <= ks:
                    continue
                if vloop.loop_order == gtir.LoopOrder.PARALLEL:
                    if self.plan.k_blocked:
                        # Execute over the whole K block; mask rows outside
                        # the section's global K interval.
                        for stmt in section.body:
                            self._exec_unit(stmt, 0, self.plan.tk, None, (ks, ke))
                    else:
                        for stmt in section.body:
                            self._exec_unit(stmt, ks, ke, None, None)
                else:
                    assert not self.plan.k_blocked
                    backward = vloop.loop_order == gtir.LoopOrder.BACKWARD
                    length = ke - ks

                    def body(step, _):
                        k = (ke - 1 - step) if backward else (ks + step)
                        for stmt in section.body:
                            self._exec_unit(stmt, None, None, k, None)
                        return 0

                    if length <= 2:
                        ks_list = range(ks, ke)
                        if backward:
                            ks_list = reversed(ks_list)
                        for k in ks_list:
                            for stmt in section.body:
                                self._exec_unit(stmt, None, None, k, None)
                    else:
                        lax.fori_loop(0, length, body, 0)

    # -- unit execution ----------------------------------------------------

    def _exec_unit(self, stmt: gtir.Stmt, ks, ke, k_seq, k_interval) -> None:
        ext = self.plan.analyzed.stmt_extents[stmt]
        ctx = (ext, ks, ke, k_seq)
        # Structural CSE scope: temporary inlining duplicates subexpressions
        # (e.g. a flux limiter's `res` in both the select condition and its
        # value); deduplicating keeps the Mosaic kernel at the hand-written
        # op count. Valid within one statement: no writes interleave.
        self._memo: dict[tuple[str, int], Any] = {}
        if isinstance(stmt, gtir.Assign):
            value = self._broadcast(self.eval_expr(stmt.value, ctx), ctx)
            mask = self._full_mask(stmt, ctx, k_interval)
            self._write(self._target_key(stmt.target, ctx), value, mask, ctx)
        elif isinstance(stmt, gtir.While):
            self._exec_while(stmt, ctx, k_interval)
        else:
            raise PallasUnsupported(type(stmt).__name__)

    def _exec_while(self, stmt: gtir.While, ctx, k_interval, outer_mask=None) -> None:
        """Vectorized while over the block: every involved buffer becomes a
        carried VALUE of one ``lax.while_loop`` (value-carried loops compile
        in Mosaic and the interpreter; ref mutation inside loop bodies does
        not interpret reliably), body writes are masked by the per-point
        iteration condition, and refs are stored back once after the loop."""
        import jax
        import jax.numpy as jnp
        from jax import lax

        from gt4py_tpu import eve
        from gt4py_tpu.cartesian.passes.extents import iter_writes

        for a in eve.walk_type(stmt, gtir.FieldAccess):
            if getattr(self.plan, "data_n", {}).get(a.name, 0):
                raise PallasUnsupported("data-dim field inside while loop")
        involved = sorted(
            {w.name for w in iter_writes(stmt)}
            | {
                a.name
                for a in eve.walk_type(stmt, gtir.FieldAccess)
                if a.name in self.blocks
            }
        )
        nested = self._value_mode
        ref_names = []
        if not nested:
            if not hasattr(self, "_ref_store"):
                self._ref_store = {}
            for n in involved:
                if n in self._refs:  # a mutable ref
                    ref_names.append(n)
                    self._ref_store[n] = self.blocks[n]
                    self.blocks[n] = self.blocks[n][...]  # -> carried value

        def mask_now():
            self._memo = {}
            m = self._broadcast(self.eval_expr(stmt.cond, ctx), ctx)
            extra = self._full_mask(stmt, ctx, k_interval)
            if extra is not None:
                m = jnp.logical_and(m, extra)
            if outer_mask is not None:
                m = jnp.logical_and(m, outer_mask)
            return m

        def body_exec(it_mask):
            for s in stmt.body:
                self._memo = {}
                if isinstance(s, gtir.Assign):
                    value = self._broadcast(self.eval_expr(s.value, ctx), ctx)
                    smask = self._full_mask(s, ctx, None)
                    total = (
                        it_mask if smask is None else jnp.logical_and(it_mask, smask)
                    )
                    self._write(self._target_key(s.target, ctx), value, total, ctx)
                elif isinstance(s, gtir.While):
                    self._exec_while(s, ctx, k_interval, outer_mask=it_mask)
                else:
                    raise PallasUnsupported(type(s).__name__)

        def cond_fn(state):
            for n, v in zip(involved, state):
                self.blocks[n] = v
            # float32 sum instead of jnp.any: Mosaic lowers reduce_or/`sum`
            # of ints through a proxy traced at COMPILE time, where the
            # globally-enabled x64 promotes to 64-bit types the lowering
            # then rejects; float32 accumulation never promotes.
            return jnp.sum(mask_now().astype(jnp.float32)) > 0.0

        def body_fn(state):
            for n, v in zip(involved, state):
                self.blocks[n] = v
            was = self._value_mode
            self._value_mode = True
            body_exec(mask_now())
            self._value_mode = was
            return tuple(self.blocks[n] for n in involved)

        state0 = tuple(self.blocks[n] for n in involved)
        final = lax.while_loop(cond_fn, body_fn, state0)
        for n, v in zip(involved, final):
            self.blocks[n] = v
        if not nested:
            for n in ref_names:
                ref = self._ref_store[n]
                ref[...] = self.blocks[n]  # store the loop's result back
                self.blocks[n] = ref

    def _target_key(self, target: gtir.FieldAccess, ctx):
        """blocks key for a write target: plain name, or (name, flat) for a
        static data-index write to a data-dimension field."""
        name = target.name
        if not getattr(self.plan, "data_n", {}).get(name, 0):
            return name
        if not target.data_index:
            raise PallasUnsupported(f"unindexed write to data-dim '{name}'")
        idx = [int(np.asarray(self.eval_expr(e, ctx))) for e in target.data_index]
        return (name, int(np.ravel_multi_index(idx, self.plan.data_shape[name])))

    def _write_value(self, name, value, mask, ctx) -> None:
        """Blend a (possibly partial) write into the carried VALUE of
        ``name`` — used inside while-loop bodies where refs cannot mutate.
        Mosaic lacks scatter/dynamic_update_slice on values, so the blend is
        pad + positional-iota masks; a traced sequential k selects its row
        by iota comparison."""
        import jax.numpy as jnp
        from jax import lax

        base = name[0] if isinstance(name, tuple) else name
        ext, ks, ke, k_seq = ctx
        NK, NI, NJ = self._shape(ctx)
        xi = self._i_base(base) + ext.i[0]
        xj = self._j_base(base) + ext.j[0]
        kb = self._k_base(base)
        cur = self.blocks[name]
        value = value.astype(cur.dtype)
        if mask is not None:
            old = self._read_stream(base, cur, (0, 0, 0), ctx)
            value = jnp.where(mask, value, old)
        SK, SI, SJ = cur.shape
        if k_seq is None and (kb + ks, xi, xj) == (0, 0, 0) and value.shape == cur.shape:
            self.blocks[name] = value
            return
        kk = lax.broadcasted_iota(jnp.int32, cur.shape, 0)
        if k_seq is None:
            padded = jnp.pad(
                value,
                ((kb + ks, SK - kb - ke), (xi, SI - xi - NI), (xj, SJ - xj - NJ)),
            )
            kcond = (kk >= kb + ks) & (kk < kb + ke)
        else:
            padded = jnp.broadcast_to(
                jnp.pad(value, ((0, 0), (xi, SI - xi - NI), (xj, SJ - xj - NJ))),
                (SK, SI, SJ),
            )
            kcond = kk == (kb + k_seq)
        ii = lax.broadcasted_iota(jnp.int32, cur.shape, 1)
        jj = lax.broadcasted_iota(jnp.int32, cur.shape, 2)
        inside = kcond & (ii >= xi) & (ii < xi + NI) & (jj >= xj) & (jj < xj + NJ)
        self.blocks[name] = jnp.where(inside, padded, cur)

    def _full_mask(self, stmt, ctx, k_interval):
        import jax.numpy as jnp
        from jax import lax

        mask = None
        if stmt.mask is not None:
            mask = self._broadcast(self.eval_expr(stmt.mask, ctx), ctx)
        if stmt.horizontal_masks:
            rmask = self._region_mask(stmt.horizontal_masks, ctx)
            mask = rmask if mask is None else jnp.logical_and(mask, rmask)
        if k_interval is not None:
            ks_g, ke_g = k_interval
            if not (ks_g == 0 and ke_g == self.nk):
                shape = self._shape(ctx)
                k_glob = lax.broadcasted_iota(jnp.int32, shape, 0) + self.k0
                kmask = jnp.logical_and(k_glob >= ks_g, k_glob < ke_g)
                mask = kmask if mask is None else jnp.logical_and(mask, kmask)
        return mask

    def _shape(self, ctx):
        ext, ks, ke, k_seq = ctx
        NK = 1 if k_seq is not None else (ke - ks)
        # In full-row J mode the unit spans the whole domain J extent.
        nj_unit = self.plan.domain[1] if self.plan.j_full else self.plan.tj
        return (
            NK,
            self.plan.ti + ext.i[1] - ext.i[0],
            nj_unit + ext.j[1] - ext.j[0],
        )

    def _broadcast(self, value, ctx):
        import jax.numpy as jnp

        return jnp.broadcast_to(value, self._shape(ctx))

    def _region_mask(self, hmasks, ctx):
        import jax.numpy as jnp
        from jax import lax

        ext, ks, ke, k_seq = ctx
        shape = self._shape(ctx)
        ni, nj, _ = self.plan.domain
        i_rel = lax.broadcasted_iota(jnp.int32, shape, 1) + self.i0 + ext.i[0]
        j_rel = lax.broadcasted_iota(jnp.int32, shape, 2) + self.j0 + ext.j[0]
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

    # -- reads / writes ----------------------------------------------------

    def _read(self, access: gtir.FieldAccess, ctx):
        name = access.name
        if name in getattr(self.plan, "table_shapes", {}):
            return self._table_lookup(access, ctx)
        if access.koffset is not None or access.abs_k is not None:
            return self._read_k_gather(access, ctx)
        if getattr(self.plan, "data_n", {}).get(name, 0):
            return self._read_datadim(access, ctx)
        return self._read_stream(name, self.blocks[name], access.offset, ctx)

    def _read_stream(self, name: str, block, offset, ctx):
        """One (K, I, J) stream; missing axes (size-1 in the block) are
        broadcast to the unit shape."""
        import jax.numpy as jnp
        from jax.experimental import pallas as pl

        ext, ks, ke, k_seq = ctx
        di, dj, dk = offset
        NK, NI, NJ = self._shape(ctx)
        bi, bj, bk = getattr(self.plan, "axes_mask", {}).get(
            name, (True, True, True)
        )
        xi = self._i_base(name) + ext.i[0] + di if bi else 0
        xj = self._j_base(name) + ext.j[0] + dj if bj else 0
        si = NI if bi else 1
        sj = NJ if bj else 1

        def bcast(sub):
            if sub.shape == (NK, NI, NJ):
                return sub
            return jnp.broadcast_to(sub, (NK, NI, NJ))

        kb = self._k_base(name)
        if not bk:
            return bcast(block[0:1, xi : xi + si, xj : xj + sj])
        if k_seq is None:
            return bcast(
                block[kb + ks + dk : kb + ke + dk, xi : xi + si, xj : xj + sj]
            )
        if isinstance(k_seq, (int, np.integer)):
            r = kb + int(k_seq) + dk
            return bcast(block[r : r + 1, xi : xi + si, xj : xj + sj])
        try:
            return bcast(
                block[pl.ds(kb + k_seq + dk, 1), xi : xi + si, xj : xj + sj]
            )
        except (IndexError, TypeError):
            # carried VALUE indexed at a traced row: one-hot reduce over K
            from jax import lax

            sub = block[:, xi : xi + si, xj : xj + sj]
            kk = lax.broadcasted_iota(jnp.int32, sub.shape, 0)
            sel = jnp.where(kk == (kb + k_seq + dk), sub, jnp.zeros_like(sub))
            return bcast(jnp.sum(sel, axis=0, keepdims=True).astype(sub.dtype))

    def _read_datadim(self, access: gtir.FieldAccess, ctx):
        """Data-dimension field read: streams are separate blocks keyed
        (name, flat_index); static indices pick one, dynamic indices one-hot
        select over the (capped) stream set."""
        import itertools

        import jax.numpy as jnp

        name = access.name
        shape_d = self.plan.data_shape[name]
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
            return self._read_stream(
                name, self.blocks[(name, flat)], access.offset, ctx
            )
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
            val = self._read_stream(
                name, self.blocks[(name, flat)], access.offset, ctx
            )
            acc = val if acc is None else jnp.where(cond, val, acc)
        return acc

    def _table_lookup(self, access: gtir.FieldAccess, ctx):
        """GlobalTable read: scalar SMEM loads, dynamic indices via one-hot
        selection over the (small) table — this Mosaic has no N-D gather."""
        import jax.numpy as jnp

        name = access.name
        tref = self.tables[name]
        shape = self.plan.table_shapes[name]
        idx_vals = []
        static = []
        for e in access.data_index:
            v = self.eval_expr(e, ctx)
            if isinstance(v, (int, np.integer)) or (
                isinstance(v, np.ndarray) and v.ndim == 0
            ):
                static.append(int(v))
                idx_vals.append(None)
            else:
                static.append(None)
                idx_vals.append(self._broadcast(v, ctx).astype(jnp.int32))

        def t_at(multi):
            row, col = (0, multi[0]) if len(shape) == 1 else (
                int(np.ravel_multi_index(multi[:-1], shape[:-1])),
                multi[-1],
            )
            return tref[row, col]

        if all(s is not None for s in static):
            return t_at(tuple(static))
        import itertools

        acc = None
        spaces = [
            [s] if s is not None else range(dim) for s, dim in zip(static, shape)
        ]
        for multi in itertools.product(*spaces):
            cond = None
            for d, v in enumerate(multi):
                if static[d] is not None:
                    continue
                c = idx_vals[d] == v
                cond = c if cond is None else jnp.logical_and(cond, c)
            entry = t_at(multi)
            acc = (
                jnp.where(cond, entry, acc)
                if acc is not None
                else jnp.where(cond, entry, jnp.zeros(self._shape(ctx), tref.dtype))
            )
        return acc

    def _read_k_gather(self, access: gtir.FieldAccess, ctx):
        """Variable/absolute K read: one-hot select over the block's K rows
        (full-K blocks are guaranteed — the plan forces tk == nk)."""
        import jax.numpy as jnp
        from jax.experimental import pallas as pl

        ext, ks, ke, k_seq = ctx
        name = access.name
        block = self.blocks[name]
        di, dj, dk = access.offset
        NK, NI, NJ = self._shape(ctx)
        xi = self._i_base(name) + ext.i[0] + di
        xj = self._j_base(name) + ext.j[0] + dj
        kb = self._k_base(name)
        if access.abs_k is not None:
            kidx = self._broadcast(self.eval_expr(access.abs_k, ctx), ctx)
        else:
            koff = self._broadcast(self.eval_expr(access.koffset, ctx), ctx)
            if k_seq is not None:
                kcur = k_seq
            else:
                from jax import lax

                kcur = lax.broadcasted_iota(jnp.int32, (NK, NI, NJ), 0) + ks + self.k0
            kidx = kcur + dk + koff
        kidx = jnp.clip(kidx.astype(jnp.int32), 0, self.nk - 1)
        acc = None
        for k in range(self.nk):
            row = block[pl.ds(kb + k, 1), xi : xi + NI, xj : xj + NJ]
            acc = row if acc is None else jnp.where(kidx == k, row, acc)
        return acc

    def _write(self, name, value, mask, ctx) -> None:
        import jax.numpy as jnp
        from jax.experimental import pallas as pl

        if self._value_mode:
            return self._write_value(name, value, mask, ctx)
        base = name[0] if isinstance(name, tuple) else name
        ext, ks, ke, k_seq = ctx
        block = self.blocks[name]
        NK, NI, NJ = self._shape(ctx)
        xi = self._i_base(base) + ext.i[0]
        xj = self._j_base(base) + ext.j[0]
        kb = self._k_base(base)
        value = value.astype(block.dtype)
        if k_seq is None:
            idx = (slice(kb + ks, kb + ke), slice(xi, xi + NI), slice(xj, xj + NJ))
        else:
            idx = (pl.ds(kb + k_seq, 1), slice(xi, xi + NI), slice(xj, xj + NJ))
        if mask is not None:
            old = block[idx]
            value = jnp.where(mask, value, old)
        block[idx] = value

    # -- expressions -------------------------------------------------------

    def eval_expr(self, expr: gtir.Expr, ctx):
        memo = getattr(self, "_memo", None)
        if memo is None:
            return self._eval_expr(expr, ctx)
        key = (repr(expr), id(ctx))
        hit = memo.get(key)
        if hit is None:
            hit = memo[key] = self._eval_expr(expr, ctx)
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
            return jnp.asarray(self.eval_expr(expr.expr, ctx)).astype(expr.dtype)
        if isinstance(expr, gtir.IteratorAccess):
            return self._iteration_index(ctx)
        raise PallasUnsupported(type(expr).__name__)

    def _iteration_index(self, ctx):
        """Absolute K index of the current iteration point, as int32 (this
        Mosaic has no 64-bit types). Parallel units: per-row iota offset by
        the unit's K window and the block's global K origin; sequential
        units: the (possibly traced) loop k. The seq-plane evaluator
        inherits this with ks == 0 and k0 == its current plane k."""
        import jax.numpy as jnp
        from jax import lax

        ext, ks, ke, k_seq = ctx
        if k_seq is not None:
            return jnp.asarray(k_seq, jnp.int32)
        shape = self._shape(ctx)
        return lax.broadcasted_iota(jnp.int32, shape, 0) + ks + self.k0


# ---------------------------------------------------------------------------
# Plane strategy: pipelined K-grid, full I/J planes per block.
# ---------------------------------------------------------------------------


def _plane_eligible(
    analyzed: AnalyzedStencil, domain: "tuple[int, int, int] | None" = None
) -> bool:
    """True when every vertical loop is PARALLEL and no field access carries
    a K offset (static, variable, or absolute): the grid can then tile K
    without halos and Pallas' automatic pipeline double-buffers the plane
    streams (measured 100% of the v5e HBM roofline on hdiff vs 24% for the
    fused XLA path).

    Variable/absolute-K gathers are deliberately NOT plane-eligible: a
    gather needs every K row of the source resident in the block, i.e.
    tk == nk with full-IJ planes — 20 MB/field at 256x256x80 f32, past
    VMEM. The tiled strategy is the right shape for this class (ti x tj x
    full-K tiles with manual DMA) and serves it today; an `allow_k_gather`
    plane mode would only duplicate it for tiny-nk domains."""
    from gt4py_tpu import eve

    for vl in analyzed.stencil.vertical_loops:
        if vl.loop_order != gtir.LoopOrder.PARALLEL:
            return False
    for p in analyzed.stencil.params:
        if not isinstance(p, gtir.FieldDecl):
            continue
        info = analyzed.field_infos.get(p.name)
        written = info is not None and info.access & AccessKind.WRITE
        # Lower-dimensional fields broadcast on read; a WRITE to one from a
        # grid spanning its missing axes is a race (and the kernel has no
        # reduced output stream for it) — leave those to the XLA path,
        # EXCEPT when the compute domain is degenerate (size 1) along every
        # missing axis: then exactly one grid point touches each output
        # element (the pure-2D stencil class, nk == 1).
        if written and p.dimensions != (True, True, True):
            if domain is None:
                return False
            for size, present in zip(domain, p.dimensions):
                if not present and size != 1:
                    return False
    for _, _, stmt in analyzed.stencil.walk_stmts():
        for node in eve.walk_values(stmt):
            if isinstance(node, gtir.FieldAccess):
                if node.offset[2] != 0 or node.koffset is not None or node.abs_k is not None:
                    return False
    return True


_plane_tk_cache: dict[str, int] = {}

# Bump when kernel codegen changes: persisted probe results (tk choices,
# staged ok-flags) describe the EMITTED kernel, not just the stencil.
_KERNEL_REV = 5  # 5: split narrow-seed output streams


def _plane_tk_candidates(nk: int, variant: str = "plane") -> list[int]:
    # plane: tk=4 measured fastest on hdiff (110.9us vs 121.1us at tk=5);
    # split: tk=4 and tk=2 tie at ~95.5us, tk=8/10 ~97us, tk>=16 ~213us
    # (hdiff 256x256x80/v5e, long-chain timing). tk>=8 also trips the
    # remote Mosaic crash on non-trivial kernels, so larger blocks come
    # later in the probe ladder.
    ladder = (4, 2, 5, 3, 8) if variant == "split" else (4, 5, 8, 3, 2)
    cands = [t for t in ladder if t <= nk and nk % t == 0]
    cands += [t for t in ladder if t <= nk and t not in cands]
    if not cands:
        cands = [max(nk, 1)] if nk < min(ladder) else [1]
    if 1 not in cands:
        cands.append(1)
    return cands


def select_plane_tk(
    analyzed: AnalyzedStencil,
    domain: tuple[int, int, int],
    origins: dict[str, tuple[int, int, int]],
    *,
    interpret: bool = False,
    variant: str = "plane",
) -> int:
    """Pick the K-block size for the plane/split strategies.

    In interpret mode any size works; on hardware the remote Mosaic compiler
    crashes on some (kernel, block-size) combinations with an opaque error,
    so candidates are probed with an AOT compile and the first success is
    cached persistently (keyed by stencil fingerprint + domain + origins)."""
    nk = domain[2]
    cands = _plane_tk_candidates(nk, variant)
    if interpret:
        return cands[0]

    import json

    from gt4py_tpu.cartesian.caching import GT_CACHE_ROOT
    from gt4py_tpu.eve.utils import content_hash

    # Key on the canonical text (pretty renders NO source locations):
    # repr() embedded source lines, so unrelated edits to the defining
    # file shifted every key and re-ran the full probe ladder (~9 min of
    # remote compiles per stencil).
    from gt4py_tpu.cartesian.gtir_pretty import pretty

    key = content_hash(
        variant,
        _KERNEL_REV,
        pretty(analyzed.stencil),
        domain,
        sorted(origins.items()),
    )
    if key in _plane_tk_cache:
        return _plane_tk_cache[key]
    cache_dir = os.path.join(GT_CACHE_ROOT, "pallas_tk")
    cache_path = os.path.join(cache_dir, f"{key}.json")
    try:
        with open(cache_path) as f:
            tk = int(json.load(f)["tk"])
        _plane_tk_cache[key] = tk
        return tk
    except (OSError, ValueError, KeyError):
        pass

    ok_cands: list[int] = []
    transient = False
    for cand in cands:
        ok = _probe_plane_compile(analyzed, domain, origins, cand, variant=variant)
        if ok:
            ok_cands.append(cand)
            if len(ok_cands) == 3:
                break
        elif ok is None:
            transient = True
    if not ok_cands:
        raise PallasUnsupported("no K-block size compiles for the plane strategy")
    tk = ok_cands[0]
    # GT4PY_PALLAS_PROBE_TIMING=0 skips the on-device timing race (used by
    # the hardware test tier: correctness runs do not need the optimal tk,
    # and a pathologically slow candidate kernel would stall the session —
    # observed ~2 s/step at tiny domains, i.e. 30+ min for one 702-step
    # probe chain).
    time_probes = os.environ.get("GT4PY_PALLAS_PROBE_TIMING", "1") not in (
        "0", "", "false"
    )
    if len(ok_cands) > 1 and time_probes:
        # The faster block size flips between compiles (Mosaic scheduling);
        # time the compiling candidates on-device and keep the winner.
        try:
            times = {
                c: _probe_plane_time(analyzed, domain, origins, c, variant)
                for c in ok_cands
            }
            tk = min(times, key=times.get)
        except Exception:
            pass
    _plane_tk_cache[key] = tk
    if not transient and (time_probes or len(ok_cands) == 1):
        # A transiently-failed earlier candidate may be the better block
        # size — don't pin this choice across processes. Likewise an
        # UNTIMED multi-candidate pick (GT4PY_PALLAS_PROBE_TIMING=0) stays
        # session-local so it cannot shadow a later measured choice.
        try:
            os.makedirs(cache_dir, exist_ok=True)
            tmp = cache_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"tk": tk}, f)
            os.replace(tmp, cache_path)
        except OSError:
            pass
    return tk


def _probe_plane_time(analyzed, domain, origins, tk, variant) -> float:
    """Per-step seconds of the candidate kernel, measured by chaining steps
    on-device in one jitted fori_loop (single calls disappear in the axon
    tunnel's ~1-2 ms dispatch jitter) and differencing two chain lengths."""
    import time

    import jax
    import jax.numpy as jnp
    from jax import lax

    if variant == "split":
        from gt4py_tpu.cartesian.backend import pallas_split

        fn = pallas_split.build_plane_split_fn(
            analyzed, domain, origins, tk=tk, interpret=False
        )
    elif variant == "staged":
        from gt4py_tpu.cartesian.backend import pallas_seq

        fn = pallas_seq.build_staged_fn(analyzed, domain, origins, interpret=False)
    else:
        fn = build_plane_fn(analyzed, domain, origins, tk=tk, interpret=False)

    shapes, scalar_shapes = _probe_arg_shapes(analyzed, domain, origins)
    arrays = {n: jnp.zeros(s.shape, s.dtype) for n, s in shapes.items()}
    scalars = {n: jnp.zeros((), s.dtype) for n, s in scalar_shapes.items()}
    padded = {n: fn.encode(n, arrays[n]) for n in fn.reads}

    # Serial-dependence fidelity: feed a written field back into a
    # shape-compatible read-only input each iteration (the way real
    # timestepping chains kernels). Without it, iterations only depend on
    # each other through the out stream and the pipeline overlaps them —
    # the probe then reports the OVERLAPPED rate (hdiff: 66.7us) while
    # genuinely chained use runs serially (96.8us), which made strategy
    # races pick the wrong kernel.
    def _struct(x):
        return jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), x)

    feedback = None
    for w in fn.writes:
        for r in fn.reads:
            if r not in fn.writes and _struct(padded[r]) == _struct(padded[w]):
                feedback = (w, r)
                break
        if feedback:
            break

    def chain(n):
        @jax.jit
        def f(p):
            def body(i, st):
                out = fn.call_padded(st, scalars)
                st = {**st, **out}
                if feedback is not None:
                    st = {**st, feedback[1]: out[feedback[0]]}
                return st

            return lax.fori_loop(0, n, body, p)

        return f

    def sync(tree):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        np.asarray(leaf.ravel()[0])

    # The tunnel's constant dispatch overhead is ~25ms with +-3ms jitter:
    # differencing a 600-step window keeps the estimate within ~5us/step
    # (the 40-step window this started with was +-125us/step — noise).
    n_lo, n_hi = 102, 702
    f_lo, f_hi = chain(n_lo), chain(n_hi)

    def timed(f):
        sync(padded)
        t0 = time.perf_counter()
        r = f(padded)
        sync(r)
        return time.perf_counter() - t0

    timed(f_lo)  # warmup: jit + remote Mosaic compile, excluded from timing
    first = timed(f_lo)
    if first > 10.0:
        # Pathological candidate (~100 ms+/step, measured POST-compile):
        # abandon before the long chain — the estimate only needs to LOSE
        # the race.
        return first / n_lo
    timed(f_hi)
    lo = min(timed(f_lo) for _ in range(3))
    hi = min(timed(f_hi) for _ in range(3))
    est = (hi - lo) / (n_hi - n_lo)
    if est <= 0 or est > hi / n_hi:
        est = hi / n_hi
    return est


def _probe_plane_compile(analyzed, domain, origins, tk, variant="plane") -> bool | None:
    """AOT-compile the plane/split kernel. True: compiles. False:
    deterministic rejection. None: transient transport failure (don't
    persist)."""
    import jax

    shapes, scalars = _probe_arg_shapes(analyzed, domain, origins)
    try:
        if variant == "split":
            from gt4py_tpu.cartesian.backend import pallas_split

            fn = pallas_split.build_plane_split_fn(
                analyzed, domain, origins, tk=tk, interpret=False
            )
        else:
            fn = build_plane_fn(analyzed, domain, origins, tk=tk, interpret=False)
        jax.jit(lambda arrays, sc: fn(arrays, sc)).lower(shapes, scalars).compile()
        return True
    except PallasUnsupported:
        return False
    except Exception as e:
        return None if _transient_probe_error(e) else False


class _PlanePlanShim:
    """Plan-shaped namespace consumed by _BlockEvaluator in plane mode."""

    def __init__(self, analyzed, domain, origins, tk, nkp):
        self.analyzed = analyzed
        self.stencil = analyzed.stencil
        self.domain = domain
        self.origins = dict(origins)
        self.tk = tk
        self.nkp = nkp
        self.ti = domain[0]
        self.tj = domain[1]
        self.j_full = False  # unit J extent == domain nj (tj == nj)
        self.k_blocked = True
        self.temps = {t.name: t for t in self.stencil.temporaries}
        self.field_ext: dict[str, Extent] = {}
        self.reads: list[str] = []
        self.writes: list[str] = []
        self.table_shapes: dict[str, tuple[int, ...]] = {}
        #: (has_I, has_J, has_K) per field; missing axes broadcast on read
        self.axes_mask: dict[str, tuple[bool, bool, bool]] = {}
        #: flattened data-dimension stream count (0 = plain scalar field)
        self.data_n: dict[str, int] = {}
        self.data_shape: dict[str, tuple[int, ...]] = {}
        for name, info in analyzed.field_infos.items():
            if info.access == AccessKind.NONE:
                continue
            if not info.axes:  # GlobalTable: SMEM operand, not a stream
                self.table_shapes[name] = tuple(info.data_dims)
                continue
            self.field_ext[name] = analyzed.field_extents.get(name, Extent.zeros())
            self.axes_mask[name] = info.domain_mask
            if info.data_dims:
                self.data_n[name] = int(np.prod(info.data_dims))
                self.data_shape[name] = tuple(info.data_dims)
            self.reads.append(name)
            if info.access & AccessKind.WRITE:
                self.writes.append(name)
        for t in self.stencil.temporaries:
            self.field_ext[t.name] = analyzed.field_extents.get(t.name, Extent.zeros())


class _PlaneEvaluator(_BlockEvaluator):
    """Block evaluator over full-plane blocks: field base offsets are the
    plain origins (halo lives inside the plane); K rows are aligned so the
    domain's k=0 sits at block row 0 of grid step 0.

    Temporaries are carried as traced VALUES (``blocks[name]`` holds a jnp
    array, rebound on write) rather than VMEM scratch refs: the remote
    Mosaic compiler crashes on kernels that partially store to / re-slice
    scratch buffers at production block sizes, and values let Mosaic keep
    short-lived planes in registers."""

    def _i_base(self, name: str) -> int:
        if name in self.plan.temps:
            return -self.plan.field_ext[name].i[0]
        return self.plan.origins[name][0]

    def _j_base(self, name: str) -> int:
        if name in self.plan.temps:
            return -self.plan.field_ext[name].j[0]
        return self.plan.origins[name][1]

    def _k_base(self, name: str) -> int:
        return 0

    def _write(self, name: str, value, mask, ctx) -> None:
        # Written FIELDS are refs (partial ref stores compile fine);
        # temporaries are traced values. Mosaic implements neither
        # `scatter` nor `dynamic_update_slice` on values, so a partial
        # value write (temp written on a K-subinterval) blends via
        # pad + positional masks instead. Inside while-loop bodies
        # (_value_mode) EVERYTHING is a carried value.
        if name not in self.plan.temps and not self._value_mode:
            return super()._write(name, value, mask, ctx)
        import jax.numpy as jnp
        from jax import lax

        ext, ks, ke, k_seq = ctx
        NK, NI, NJ = self._shape(ctx)
        xi = self._i_base(name) + ext.i[0]
        xj = self._j_base(name) + ext.j[0]
        cur = self.blocks[name]
        value = value.astype(cur.dtype)
        if mask is not None:
            value = jnp.where(mask, value, cur[ks:ke, xi : xi + NI, xj : xj + NJ])
        if (ks, xi, xj) == (0, 0, 0) and value.shape == cur.shape:
            self.blocks[name] = value
            return
        SK, SI, SJ = cur.shape
        padded = jnp.pad(value, ((ks, SK - ke), (xi, SI - xi - NI), (xj, SJ - xj - NJ)))
        region = jnp.ones(cur.shape, dtype=jnp.bool_)
        for axis, (lo, size) in enumerate(((ks, ke - ks), (xi, NI), (xj, NJ))):
            pos = lax.broadcasted_iota(jnp.int32, cur.shape, axis)
            region = jnp.logical_and(region, (pos >= lo) & (pos < lo + size))
        self.blocks[name] = jnp.where(region, padded, cur)

    def _full_mask(self, stmt, ctx, k_interval):
        import jax.numpy as jnp
        from jax import lax

        mask = None
        if stmt.mask is not None:
            mask = self._broadcast(self.eval_expr(stmt.mask, ctx), ctx)
        if stmt.horizontal_masks:
            rmask = self._region_mask(stmt.horizontal_masks, ctx)
            mask = rmask if mask is None else jnp.logical_and(mask, rmask)
        if k_interval is not None:
            ks_g, ke_g = k_interval
            # Unlike the tiled path, padded K rows (nkp > nk) must also be
            # masked off: they exist only to make nk divisible by tk.
            if not (ks_g == 0 and ke_g == self.nk and self.plan.nkp == self.nk):
                shape = self._shape(ctx)
                k_glob = lax.broadcasted_iota(jnp.int32, shape, 0) + self.k0
                kmask = jnp.logical_and(k_glob >= ks_g, k_glob < ke_g)
                mask = kmask if mask is None else jnp.logical_and(mask, kmask)
        return mask



def build_plane_fn(
    analyzed: AnalyzedStencil,
    domain: tuple[int, int, int],
    origins: dict[str, tuple[int, int, int]],
    *,
    tk: int,
    interpret: bool = False,
):
    """Build the plane-strategy fn(arrays: dict[name -> (I, J, K)], scalars)
    -> dict of written arrays."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _check_supported(
        analyzed,
        interpret=interpret,
        allow_while=True,
        allow_tables=True,
        allow_lower_dims=True,
        allow_data_dims=True,
    )
    ni, nj, nk = domain
    nkp = _round_up(nk, tk)
    plan = _PlanePlanShim(analyzed, domain, origins, tk, nkp)
    reads = plan.reads
    writes = plan.writes
    tables = sorted(plan.table_shapes)
    scalar_names = [
        n for n, i in analyzed.parameter_infos.items() if i.access != AccessKind.NONE
    ]
    temp_names = list(plan.temps)
    temp_shapes = {}
    for name in temp_names:
        ext = plan.field_ext[name]
        temp_shapes[name] = (tk, ni + ext.i[1] - ext.i[0], nj + ext.j[1] - ext.j[0])
    dtypes = {
        n: (
            analyzed.field_infos[n].dtype
            if n in analyzed.field_infos
            else (plan.temps[n].dtype or np.float64)
        )
        for n in plan.field_ext
    }

    def axes_of(n):
        return plan.axes_mask.get(n, (True, True, True))

    def streams_of(n):
        """blocks/operand keys for one field: the name itself, or one
        (name, flat) key per flattened data index."""
        d = plan.data_n.get(n, 0)
        return [(n, i) for i in range(d)] if d else [n]

    in_streams = [k for n in reads for k in streams_of(n)]
    out_streams = [k for n in writes for k in streams_of(n)]

    def kernel(*refs):
        import jax.numpy as jnp

        pos = 0
        sref = {n: refs[pos + i] for i, n in enumerate(scalar_names)}
        pos += len(scalar_names)
        tref = {n: refs[pos + i] for i, n in enumerate(tables)}
        pos += len(tables)
        in_refs = {k: refs[pos + i] for i, k in enumerate(in_streams)}
        pos += len(in_streams)
        out_refs = {k: refs[pos + i] for i, k in enumerate(out_streams)}

        # Read-only fields are hoisted to values loaded ONCE (repeated ref
        # re-reads measured 1.6x slower on hdiff); written fields use their
        # out ref as working buffer (partial ref stores compile, partial
        # value updates don't — Mosaic lacks scatter/dynamic_update_slice),
        # seeded from the aliased original so non-domain points survive the
        # full block write-back. Temporaries are traced values.
        blocks: dict[Any, Any] = {}
        for k in in_streams:
            if k in out_refs:
                out_refs[k][...] = in_refs[k][...]
                blocks[k] = out_refs[k]
            else:
                blocks[k] = in_refs[k][...]
        for n in temp_names:
            blocks[n] = jnp.zeros(temp_shapes[n], dtypes[n])

        k0 = pl.program_id(0) * tk
        ev = _PlaneEvaluator(
            plan, blocks, sref, k0, 0, 0, tables=tref, refs=set(out_streams)
        )
        ev.run()

    def encode(n: str, a: Any) -> Any:
        """Public array -> padded kernel-native block(s).

        Full fields: (I, J, K) -> (Kp, Ip, Jp), K aligned so domain k=0 is
        row 0 (per-field K origins differ; BlockSpec offsets are
        block-granular so alignment happens here). Lower-dimensional fields
        keep size-1 axes for the missing dimensions. Data-dimension fields
        produce a stacked (D, Kp, Ip, Jp) array (one kernel stream per flat
        index). GlobalTables pass through as 2-D SMEM operands.
        """
        if n in plan.table_shapes:
            return jnp.asarray(a).reshape(_table_2d(plan.table_shapes[n]))
        bi, bj, bk = axes_of(n)
        nd = len(plan.data_shape.get(n, ()))
        a = jnp.asarray(a)
        # insert missing spatial axes -> (I, J, K, *data)
        pos = 0
        for present in (bi, bj, bk):
            if not present:
                a = jnp.expand_dims(a, pos)
            pos += 1
        # -> (D, K, I, J)
        if nd:
            spatial = (0, 1, 2)
            dd = tuple(range(3, 3 + nd))
            a = jnp.transpose(a, dd + (2, 0, 1))
            a = a.reshape((plan.data_n[n],) + a.shape[nd:])
        else:
            a = jnp.transpose(a, (2, 0, 1))[None]
        ok = origins[n][2] if bk else 0
        rows = a[:, ok : ok + min(nk, a.shape[1] - ok)] if bk else a[:, :1]
        pk = (nkp - rows.shape[1]) if bk else 0
        pi = _round_up(rows.shape[2], _SUBLANE) - rows.shape[2] if bi else 0
        pj = _round_up(rows.shape[3], _LANE) - rows.shape[3] if bj else 0
        rows = jnp.pad(rows, ((0, 0), (0, pk), (0, pi), (0, pj)))
        return rows if nd else rows[0]

    def stream_arg(padded, key):
        return padded[key][0] if isinstance(key, tuple) else padded[key]

    def stream_of(padded, key):
        if isinstance(key, tuple):
            return padded[key[0]][key[1]]
        return padded[key]

    def call_padded(padded: dict[str, Any], scalars: dict[str, Any]) -> dict[str, Any]:
        """Run the kernel on already-encoded blocks; chained stencil steps
        stay in native layout with zero per-step conversion cost."""
        scalar_args = [jnp.asarray(scalars[n]).reshape(1, 1) for n in scalar_names]
        table_args = [padded[n] for n in tables]
        in_args = [stream_of(padded, k) for k in in_streams]
        out_shapes = [
            jax.ShapeDtypeStruct(stream_of(padded, k).shape, stream_of(padded, k).dtype)
            for k in out_streams
        ]
        n_lead = len(scalar_names) + len(tables)
        aliases = {
            n_lead + in_streams.index(k): wi for wi, k in enumerate(out_streams)
        }

        def block_spec(k):
            shape = stream_of(padded, k).shape
            name = k[0] if isinstance(k, tuple) else k
            if axes_of(name)[2]:
                return pl.BlockSpec((tk, shape[1], shape[2]), lambda g: (g, 0, 0))
            return pl.BlockSpec((1, shape[1], shape[2]), lambda g: (0, 0, 0))

        # x64 trace context crashes the remote Mosaic compiler (see the
        # tiled strategy); kernel dtypes are explicit so this scope only
        # affects lowering internals.
        with jax.enable_x64(jax.config.jax_enable_x64 if interpret else False):
            results = pl.pallas_call(
                kernel,
                grid=(nkp // tk,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * n_lead
                + [block_spec(k) for k in in_streams],
                out_specs=[block_spec(k) for k in out_streams],
                out_shape=out_shapes,
                input_output_aliases=aliases,
                interpret=interpret,
            )(*scalar_args, *table_args, *in_args)
        if not isinstance(results, (tuple, list)):
            results = (results,)
        out: dict[str, Any] = {}
        for n in writes:
            ks = streams_of(n)
            if plan.data_n.get(n, 0):
                out[n] = jnp.stack(
                    [results[out_streams.index(k)] for k in ks], axis=0
                )
            else:
                out[n] = results[out_streams.index(n)]
        return out

    def decode(n: str, r: Any, original: Any) -> Any:
        """Padded kernel-native result -> public array, reassembling K rows
        outside the domain from the original field content. Written fields
        span full IJK, or (eligibility) miss only axes the domain is
        degenerate along (pure-2D stencils) — missing axes round-trip as
        size-1 and squeeze back at the end."""
        nd = len(plan.data_shape.get(n, ()))
        bi, bj, bk = axes_of(n)
        original = jnp.asarray(original)
        pos = 0
        for present in (bi, bj, bk):
            if not present:
                original = jnp.expand_dims(original, pos)
            pos += 1
        if nd:
            dd = tuple(range(3, 3 + nd))
            kf = jnp.transpose(original, dd + (2, 0, 1))  # (*data, K, I, J)
            kf = kf.reshape((plan.data_n[n],) + kf.shape[nd:])
        else:
            kf = jnp.transpose(original, (2, 0, 1))[None]
            r = r[None]
        ok = origins[n][2]
        nrows = min(nk, kf.shape[1] - ok)
        rows = r[:, :nrows, : kf.shape[2], : kf.shape[3]]
        if ok > 0 or ok + nrows < kf.shape[1]:
            rows = jnp.concatenate(
                [kf[:, :ok], rows, kf[:, ok + nrows :]], axis=1
            )
        # (D, K, I, J) -> (I, J, K, *data)
        out = jnp.transpose(rows, (2, 3, 1, 0))
        if nd:
            out = out.reshape(out.shape[:3] + plan.data_shape[n])
        else:
            out = out[..., 0]
        squeeze = tuple(i for i, m in enumerate((bi, bj, bk)) if not m)
        if squeeze:
            out = jnp.squeeze(out, axis=squeeze)
        return out

    def fn(arrays: dict[str, Any], scalars: dict[str, Any]) -> dict[str, Any]:
        padded = {n: encode(n, arrays[n]) for n in reads + tables}
        results = call_padded(padded, scalars)
        return {n: decode(n, r, arrays[n]) for n, r in results.items()}

    fn.encode = encode
    fn.decode = decode
    fn.call_padded = call_padded
    fn.reads = tuple(reads) + tuple(tables)
    fn.tables = tuple(tables)
    fn.writes = tuple(writes)
    fn.strategy = "plane"
    return fn
