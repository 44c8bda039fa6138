"""Pallas TPU kernel generation for GTIR stencils.

This is the fused-kernel path the reference reaches with generated CUDA
(gt:gpu, /root/reference/src/gt4py/cartesian/backend/gtcpp_backend.py:169)
and the BASELINE north star describes for TPU: the whole stencil — all
vertical loops, all statement units, all temporaries — executes as ONE
Pallas kernel per tile:

- internal layout is K-leading ``(K, I, J)``: J rides the 128-wide lanes,
  I the sublanes, and sequential-K iteration walks the major axis (cheap
  dynamic slices); the public (I, J, K) arrays are transposed and padded at
  the jit boundary (adjacent transposes cancel under XLA when stencils are
  chained or composed under one jit),
- the grid tiles the I axis; J stays whole (TPU DMA slices must be
  (8, 128)-tile aligned — J is padded to a lane multiple and copied in full
  rows, I windows are 8-aligned via per-field front padding),
- each grid instance DMAs halo-extended field windows HBM→VMEM (manual
  async copies — halo overlap is not expressible with automatic BlockSpec
  blocking), computes every unit in VMEM, and DMAs written tiles back,
- temporaries never touch HBM: they are VMEM scratch blocks sized by their
  access extents (the role of the reference's IJ-cache OIR pass,
  oir_optimizations/caches.py:44),
- FORWARD/BACKWARD sections run as ``fori_loop`` over the block's K rows
  with all state in VMEM (the K-cache role, caches.py:92).

Unsupported features (variable/absolute K offsets, data dimensions,
GlobalTables, non-IJK fields, 64-bit dtypes on hardware) raise
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


class _Plan:
    """Static kernel plan for one (domain, origins, shapes) specialization."""

    def __init__(self, analyzed: AnalyzedStencil, domain, origins, array_k: dict[str, int]):
        self.analyzed = analyzed
        self.stencil = analyzed.stencil
        self.domain = domain
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

        # Per-field paddings: aligned origins in I, lane-padded J.
        self.pad_i_front: dict[str, int] = {}
        self.nj_pad = _round_up(nj + max(
            (origins[n][1] + self.field_ext[n].j[1] for n in self.reads), default=0
        ) + max((-self.field_ext[n].j[0] for n in self.reads), default=0), _LANE)
        self.origins = dict(origins)
        for name in self.reads:
            oi = origins[name][0]
            self.pad_i_front[name] = (-oi) % _SUBLANE

        # J-block width: full padded rows.
        self.njb = self.nj_pad

        # I tile: multiple of sublane; grow while VMEM allows.
        ti = _SUBLANE
        while ti * 2 <= _round_up(ni, _SUBLANE) and self._vmem_bytes(ti * 2, nk) <= _VMEM_BUDGET:
            ti *= 2
        if self._vmem_bytes(ti, nk) > _VMEM_BUDGET:
            raise PallasUnsupported("VMEM budget exceeded for minimal tile")
        self.ti = ti
        self.grid = (-(-ni // ti),)
        self.array_k = array_k

    def _i_window(self, name: str, ti: int) -> tuple[int, int]:
        """(misalignment m, window size) for a field's I DMA window; the
        window start i0 + oi' + ext.lo - m is 8-aligned because oi' is."""
        ext = self.field_ext.get(name, Extent.zeros())
        m = ext.i[0] % _SUBLANE  # == (ext.lo mod 8), start shift
        size = _round_up(ti + ext.i[1] - ext.i[0] + m, _SUBLANE)
        return m, size

    def _block_shape(self, name: str, ti: int, nk: int):
        ext = self.field_ext.get(name, Extent.zeros())
        _, isize = self._i_window(name, ti)
        wk = ext.k[1] - ext.k[0]
        return (nk + wk, isize, self.njb)

    def _vmem_bytes(self, ti: int, nk: int) -> int:
        total = 0
        for name in list(self.field_ext):
            shape = self._block_shape(name, ti, nk)
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

    reads_order = [
        n for n, i in analyzed.field_infos.items() if i.access != AccessKind.NONE
    ]
    scalar_names = [
        n for n, i in analyzed.parameter_infos.items() if i.access != AccessKind.NONE
    ]

    # array_k filled at call time; plan built lazily per call shapes.
    plan_holder: dict[str, Any] = {}

    def make_plan(array_shapes: dict[str, tuple[int, ...]]) -> _Plan:
        key = tuple(sorted(array_shapes.items()))
        if plan_holder.get("key") != key:
            array_k = {n: s[2] for n, s in array_shapes.items()}
            plan_holder["plan"] = _Plan(analyzed, domain, origins, array_k)
            plan_holder["key"] = key
        return plan_holder["plan"]

    def fn(arrays: dict[str, Any], scalars: dict[str, Any]) -> dict[str, Any]:
        plan = make_plan({n: tuple(arrays[n].shape) for n in reads_order})
        TI = plan.ti
        reads = plan.reads
        writes = plan.writes
        dtypes = {
            n: (
                analyzed.field_infos[n].dtype
                if n in analyzed.field_infos
                else (plan.temps[n].dtype or np.float64)
            )
            for n in plan.field_ext
        }

        # ---- pad + transpose to (K, I, J) --------------------------------
        padded = {}
        ni_pad = {}
        for n in reads:
            a = arrays[n]
            kf = jnp.transpose(a, (2, 0, 1))
            front = plan.pad_i_front[n]
            _, iwin = plan._i_window(n, TI)
            # capacity: last tile start + window must fit
            need_i = (plan.grid[0] - 1) * TI + iwin + front
            back = max(0, _round_up(max(need_i, kf.shape[1] + front), _SUBLANE) - kf.shape[1] - front) + _SUBLANE
            pj = plan.nj_pad - kf.shape[2]
            if pj < 0:
                pj = _round_up(kf.shape[2], _LANE) - kf.shape[2]
            padded[n] = jnp.pad(kf, ((0, 0), (front, back), (0, max(pj, 0))))
            ni_pad[n] = padded[n].shape[1]

        njb = max(p.shape[2] for p in padded.values())
        padded = {
            n: (jnp.pad(p, ((0, 0), (0, 0), (0, njb - p.shape[2]))) if p.shape[2] < njb else p)
            for n, p in padded.items()
        }
        plan.njb = njb  # all J blocks share the widest padded row

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

            i0 = pl.program_id(0) * TI

            dmas = []
            for idx, name in enumerate(reads):
                ext = plan.field_ext[name]
                oi, oj, ok = plan.origins[name]
                oi_p = oi + plan.pad_i_front[name]
                m, iwin = plan._i_window(name, TI)
                src = in_refs[name].at[
                    pl.ds(ok + ext.k[0], nk + ext.k[1] - ext.k[0]),
                    pl.ds(i0 + oi_p + ext.i[0] - m, iwin),
                    pl.ds(0, njb),
                ]
                dma = pltpu.make_async_copy(src, blocks[name], in_sems.at[np.int32(idx)])
                dma.start()
                dmas.append(dma)
            for dma in dmas:
                dma.wait()

            ev = _BlockEvaluator(plan, blocks, sref, nk, nj)
            ev.run()

            out_dmas = []
            for idx, name in enumerate(writes):
                ext = plan.field_ext[name]
                oi, oj, ok = plan.origins[name]
                oi_p = oi + plan.pad_i_front[name]
                m, iwin = plan._i_window(name, TI)
                # Tile rows live at block rows [m - ext.i[0], +TI) — 8-aligned
                # because m ≡ ext.i[0] (mod 8).
                x0 = m - ext.i[0]
                src = blocks[name].at[
                    pl.ds(0, blocks[name].shape[0]),
                    pl.ds(x0, TI),
                    pl.ds(0, njb),
                ]
                dst = out_refs[name].at[
                    pl.ds(ok + ext.k[0], nk + ext.k[1] - ext.k[0]),
                    pl.ds(i0 + oi_p, TI),
                    pl.ds(0, njb),
                ]
                dma = pltpu.make_async_copy(src, dst, out_sems.at[np.int32(idx)])
                dma.start()
                out_dmas.append(dma)
            for dma in out_dmas:
                dma.wait()

        scalar_args = [jnp.asarray(scalars[n]).reshape(1, 1) for n in scalar_names]
        in_args = [padded[n] for n in reads]
        out_shapes = [jax.ShapeDtypeStruct(padded[n].shape, padded[n].dtype) for n in writes]
        aliases = {
            len(scalar_names) + reads.index(n): wi for wi, n in enumerate(writes)
        }
        scratch_shapes = [
            pltpu.VMEM(plan._block_shape(n, TI, nk), dtypes[n]) for n in plan.field_ext
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
            front = plan.pad_i_front[n]
            kf_shape = (arrays[n].shape[2], arrays[n].shape[0], arrays[n].shape[1])
            r = r[:, front : front + kf_shape[1], : kf_shape[2]]
            out[n] = jnp.transpose(r, (1, 2, 0))
        return out

    return fn


class _BlockEvaluator:
    """Evaluates the lowered GTIR over VMEM blocks in (K, I, J) layout.

    Block coordinates for field f: tile point (i, j) of the compute tile
    sits at block row ``i + m - ext.i[0]`` and column ``j + oj``; domain K
    level k at block K row ``k - ext.k[0]``.
    """

    def __init__(self, plan: _Plan, blocks, scalars, nk: int, nj: int):
        self.plan = plan
        self.blocks = blocks
        self.scalars = scalars
        self.nk = nk
        self.nj = nj

    def _i_base(self, name: str) -> int:
        ext = self.plan.field_ext[name]
        m, _ = self.plan._i_window(name, self.plan.ti)
        return m - ext.i[0]

    def _j_base(self, name: str) -> int:
        if name in self.plan.temps:
            return -self.plan.field_ext[name].j[0]
        return self.plan.origins[name][1]

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
                    for stmt in section.body:
                        self._exec_unit(stmt, ks, ke, None)
                else:
                    backward = vloop.loop_order == gtir.LoopOrder.BACKWARD
                    length = ke - ks

                    def body(step, _):
                        k = (ke - 1 - step) if backward else (ks + step)
                        for stmt in section.body:
                            self._exec_unit(stmt, None, None, k)
                        return 0

                    if length <= 2:
                        ks_list = range(ks, ke)
                        if backward:
                            ks_list = reversed(ks_list)
                        for k in ks_list:
                            for stmt in section.body:
                                self._exec_unit(stmt, None, None, k)
                    else:
                        lax.fori_loop(0, length, body, 0)

    # -- unit execution ----------------------------------------------------

    def _exec_unit(self, stmt: gtir.Stmt, ks, ke, k_seq) -> None:
        ext = self.plan.analyzed.stmt_extents[stmt]
        ctx = (ext, ks, ke, k_seq)
        if isinstance(stmt, gtir.Assign):
            value = self._broadcast(self.eval_expr(stmt.value, ctx), ctx)
            mask = self._full_mask(stmt, ctx)
            self._write(stmt.target.name, value, mask, ctx)
        elif isinstance(stmt, gtir.While):
            self._exec_while(stmt, ctx)
        else:
            raise PallasUnsupported(type(stmt).__name__)

    def _exec_while(self, stmt: gtir.While, ctx) -> None:
        import jax.numpy as jnp
        from jax import lax

        def eval_mask():
            cond = self._broadcast(self.eval_expr(stmt.cond, ctx), ctx)
            extra = self._full_mask(stmt, ctx)
            return cond if extra is None else jnp.logical_and(cond, extra)

        def cond_fn(_):
            return jnp.any(eval_mask())

        def body_fn(_):
            mask = eval_mask()
            for s in stmt.body:
                if not isinstance(s, gtir.Assign):
                    raise PallasUnsupported("nested control flow in while")
                value = self._broadcast(self.eval_expr(s.value, ctx), ctx)
                smask = self._full_mask(s, ctx)
                total = mask if smask is None else jnp.logical_and(mask, smask)
                self._write(s.target.name, value, total, ctx)
            return 0

        lax.while_loop(cond_fn, body_fn, 0)

    def _full_mask(self, stmt, ctx):
        import jax.numpy as jnp

        mask = None
        if stmt.mask is not None:
            mask = self._broadcast(self.eval_expr(stmt.mask, ctx), ctx)
        if stmt.horizontal_masks:
            rmask = self._region_mask(stmt.horizontal_masks, ctx)
            mask = rmask if mask is None else jnp.logical_and(mask, rmask)
        return mask

    def _shape(self, ctx):
        ext, ks, ke, k_seq = ctx
        NK = 1 if k_seq is not None else (ke - ks)
        return (
            NK,
            self.plan.ti + ext.i[1] - ext.i[0],
            self.nj + ext.j[1] - ext.j[0],
        )

    def _broadcast(self, value, ctx):
        import jax.numpy as jnp

        return jnp.broadcast_to(value, self._shape(ctx))

    def _region_mask(self, hmasks, ctx):
        import jax.numpy as jnp
        from jax import lax
        from jax.experimental import pallas as pl

        ext, ks, ke, k_seq = ctx
        shape = self._shape(ctx)
        ni, nj, _ = self.plan.domain
        i0 = pl.program_id(0) * self.plan.ti
        i_rel = lax.broadcasted_iota(jnp.int32, shape, 1) + i0 + ext.i[0]
        j_rel = lax.broadcasted_iota(jnp.int32, shape, 2) + ext.j[0]
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
