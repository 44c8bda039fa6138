"""Pallas TPU kernel generation for GTIR stencils.

This is the fused-kernel path the reference reaches with generated CUDA
(gt:gpu, /root/reference/src/gt4py/cartesian/backend/gtcpp_backend.py:169)
and the BASELINE north star describes for TPU: the whole stencil — all
vertical loops, all statement units, all temporaries — executes as ONE
Pallas kernel per tile:

- internal layout is K-leading ``(K, I, J)``: J rides the 128-wide lanes,
  I the sublanes, sequential-K iteration walks the major axis; the public
  (I, J, K) arrays are transposed and padded at the jit boundary (adjacent
  transposes cancel under XLA when stencils are chained under one jit),
- the grid tiles I (sublane-aligned), J (lane-aligned: halos are quantized
  to whole 128-lane tiles — TPU DMA offsets/shapes must respect (8, 128)
  memref tiling), and, for stencils without sequential loops, K as well
  (K is the unconstrained major axis; K-interval sections are handled by
  masking rows against the block's global K range),
- each grid instance DMAs halo-extended field windows HBM→VMEM (manual
  async copies — halo overlap is not expressible with automatic BlockSpec
  blocking), computes every unit in VMEM, and DMAs written tiles back
  (aliased outputs, disjoint interiors),
- temporaries never touch HBM: they are VMEM scratch blocks sized by their
  access extents (the role of the reference's IJ-cache OIR pass,
  oir_optimizations/caches.py:44),
- FORWARD/BACKWARD sections run as ``fori_loop`` over the block's K rows
  with all state in VMEM (the K-cache role, caches.py:92).

Unsupported features (variable/absolute K offsets, data dimensions,
GlobalTables, non-IJK fields, while loops, 64-bit dtypes on hardware) raise
``PallasUnsupported``; the backend falls back to the XLA-traced path.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from gt4py_tpu.cartesian import gtir
from gt4py_tpu.cartesian.definitions import AccessKind, Extent
from gt4py_tpu.cartesian.passes.pipeline import AnalyzedStencil


class PallasUnsupported(Exception):
    pass


_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom below ~16 MB/core
_LANE = 128
_SUBLANE = 8


def _check_supported(analyzed: AnalyzedStencil, *, interpret: bool) -> None:
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
            raise PallasUnsupported("GlobalTable")
        if isinstance(p, gtir.FieldDecl):
            if p.data_dims:
                raise PallasUnsupported("data dimensions")
            if p.dimensions != (True, True, True):
                raise PallasUnsupported("non-IJK field")
    for _, _, stmt in analyzed.stencil.walk_stmts():
        if isinstance(stmt, gtir.While):
            # lax.while_loop over mutable blocks hangs the Pallas
            # interpreter; route while-stencils through the XLA path.
            raise PallasUnsupported("while loop")
        for node in eve.walk_values(stmt):
            if isinstance(node, gtir.FieldAccess):
                if node.koffset is not None or node.abs_k is not None:
                    raise PallasUnsupported("variable/absolute K offset")
                if node.data_index:
                    raise PallasUnsupported("data index")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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
        for name, info in analyzed.field_infos.items():
            if info.access == AccessKind.NONE:
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
        tk_full = self.sequential or nk <= 8
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


def build_pallas_fn(
    analyzed: AnalyzedStencil,
    domain: tuple[int, int, int],
    origins: dict[str, tuple[int, int, int]],
    *,
    interpret: bool = False,
):
    """Build fn(arrays: dict[name -> (I, J, K) jnp array], scalars) -> dict
    of written arrays, executing the stencil as one Pallas kernel."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _check_supported(analyzed, interpret=interpret)
    ni, nj, nk = domain
    plan = _Plan(analyzed, domain, origins)
    TI, TJ, TK = plan.ti, plan.tj, plan.tk
    reads = plan.reads
    writes = plan.writes
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

        ev = _BlockEvaluator(plan, blocks, sref, k0, i0, j0)
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
        in_args = [padded[n] for n in reads]
        out_shapes = [jax.ShapeDtypeStruct(padded[n].shape, padded[n].dtype) for n in writes]
        aliases = {
            len(scalar_names) + reads.index(n): wi for wi, n in enumerate(writes)
        }
        scratch_shapes = [
            pltpu.VMEM(plan._block_shape(n, TI, TJ, TK), dtypes[n])
            for n in plan.field_ext
        ] + [
            pltpu.SemaphoreType.DMA((max(len(reads), 1),)),
            pltpu.SemaphoreType.DMA((max(len(writes), 1),)),
        ]

        results = pl.pallas_call(
            kernel,
            grid=plan.grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * len(scalar_names)
            + [pl.BlockSpec(memory_space=pltpu.ANY)] * len(reads),
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * len(writes),
            out_shape=out_shapes,
            scratch_shapes=scratch_shapes,
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_BUDGET + 4 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*scalar_args, *in_args)
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

    return fn


class _BlockEvaluator:
    """Evaluates the lowered GTIR over VMEM blocks in (K, I, J) layout.

    Block coordinates for field f: tile point (i, j, k) (relative to the
    tile's (i0, j0, k0)) sits at block
    ``[k + k_lo, i + m - ext.i[0], j + LANE*n_lo + (uext-adjusted)]``.
    Under K blocking, K-interval sections mask rows against the block's
    global K range (k0 is traced).
    """

    def __init__(self, plan: _Plan, blocks, scalars, k0, i0, j0):
        self.plan = plan
        self.blocks = blocks
        self.scalars = scalars
        self.k0 = k0
        self.i0 = i0
        self.j0 = j0
        self.nk = plan.domain[2]

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
        if isinstance(stmt, gtir.Assign):
            value = self._broadcast(self.eval_expr(stmt.value, ctx), ctx)
            mask = self._full_mask(stmt, ctx, k_interval)
            self._write(stmt.target.name, value, mask, ctx)
        else:
            raise PallasUnsupported(type(stmt).__name__)

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
        from jax.experimental import pallas as pl

        ext, ks, ke, k_seq = ctx
        name = access.name
        block = self.blocks[name]
        di, dj, dk = access.offset
        NK, NI, NJ = self._shape(ctx)
        xi = self._i_base(name) + ext.i[0] + di
        xj = self._j_base(name) + ext.j[0] + dj
        kb = self._k_base(name)
        if k_seq is None:
            return block[kb + ks + dk : kb + ke + dk, xi : xi + NI, xj : xj + NJ]
        return block[pl.ds(kb + k_seq + dk, 1), xi : xi + NI, xj : xj + NJ]

    def _write(self, name: str, value, mask, ctx) -> None:
        import jax.numpy as jnp
        from jax.experimental import pallas as pl

        ext, ks, ke, k_seq = ctx
        block = self.blocks[name]
        NK, NI, NJ = self._shape(ctx)
        xi = self._i_base(name) + ext.i[0]
        xj = self._j_base(name) + ext.j[0]
        kb = self._k_base(name)
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
        raise PallasUnsupported(type(expr).__name__)
