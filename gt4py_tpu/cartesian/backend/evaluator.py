"""Vectorized GTIR execution engine.

This module is the TPU-native replacement for the reference's code
generators: where the reference emits NumPy source (gtc/numpy/npir_codegen.py)
or C++/CUDA (gtc/gtcpp/, gtc/dace/), this engine *traces* the lowered GTIR
directly into array operations:

- with ``ns="numpy"`` it executes eagerly on NumPy arrays (the reference's
  ``numpy`` backend semantics — the correctness oracle),
- with ``ns="jax"`` the same trace runs under ``jax.jit``: PARALLEL loops
  become fused elementwise/shift operations on (I, J, K) blocks, and
  FORWARD/BACKWARD loops become ``lax.scan`` over K carrying the updated
  arrays, which XLA compiles to a single fused TPU loop.

Semantics notes (mirroring the reference's generated code):
- every statement unit executes over the compute domain extended by its
  access extent (per-statement extents from passes/extents.py, the analog of
  OIR HorizontalExecution extents),
- conditional writes are masked selects (both branches evaluated), matching
  the reference's OIR mask lowering,
- in FORWARD/BACKWARD loops, K-offset reads of fields written in the same
  loop observe already-updated values (basis of tridiagonal solvers,
  reference gtscript.rst:120-137).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import numpy as np

from gt4py_tpu.cartesian import gtir
from gt4py_tpu.cartesian.definitions import Extent
from gt4py_tpu.cartesian.passes.pipeline import AnalyzedStencil

# Max sequential-section length that is unrolled instead of lax.scan'ed.
_UNROLL_MAX = 3


def _np_unary_vec(fn):
    vec = np.vectorize(fn)

    def impl(x):
        out = vec(x)
        return out if isinstance(out, np.ndarray) else np.asarray(out)

    return impl


class _NamespaceOps:
    """Array-namespace dispatch (NumPy eager vs JAX traced)."""

    def __init__(self, kind: str):
        self.kind = kind
        if kind == "jax":
            import jax
            import jax.numpy as jnp

            self.jax = jax
            self.xp = jnp
        else:
            self.jax = None
            self.xp = np

    # -- slicing ----------------------------------------------------------

    def slice_nd(self, arr, starts, sizes):
        if all(isinstance(s, (int, np.integer)) for s in starts):
            idx = tuple(slice(int(s), int(s) + int(z)) for s, z in zip(starts, sizes))
            idx = idx + (slice(None),) * (arr.ndim - len(starts))
            return arr[idx]
        assert self.kind == "jax"
        import jax.lax as lax

        full_starts = list(starts) + [0] * (arr.ndim - len(starts))
        full_sizes = list(sizes) + list(arr.shape[len(starts):])
        return lax.dynamic_slice(arr, full_starts, full_sizes)

    def update_nd(self, arr, starts, value):
        if self.kind == "numpy":
            idx = tuple(
                slice(int(s), int(s) + int(z)) for s, z in zip(starts, value.shape)
            )
            idx = idx + (slice(None),) * (arr.ndim - len(starts))
            arr[idx] = value
            return arr
        if all(isinstance(s, (int, np.integer)) for s in starts):
            idx = tuple(slice(int(s), int(s) + z) for s, z in zip(starts, value.shape))
            return arr.at[idx].set(value)
        import jax.lax as lax

        full_starts = list(starts) + [0] * (arr.ndim - len(starts))
        return lax.dynamic_update_slice(arr, value, full_starts)

    def take_along_k(self, arr, idx):
        xp = self.xp
        idx = xp.clip(idx, 0, arr.shape[2] - 1)
        return xp.take_along_axis(arr, idx, axis=2)

    def iota(self, n: int, axis: int, shape3) -> Any:
        xp = self.xp
        vec = xp.arange(n, dtype=np.int64)
        reshape = [1, 1, 1]
        reshape[axis] = n
        return vec.reshape(reshape)


# Native function implementations per namespace kind.
def _native_impls(ops: _NamespaceOps) -> dict:
    xp = ops.xp
    if ops.kind == "jax":
        import jax.scipy.special as jsp

        gamma_fn = getattr(jsp, "gamma", None)
        if gamma_fn is None:
            def gamma_fn(x):  # Γ(x) via lgamma; correct sign via reflection
                return xp.exp(jsp.gammaln(x)) * xp.where(
                    (x < 0) & (xp.floor(x / 2) * 2 != xp.floor(x)), -1.0, 1.0
                )
        erf_fn, erfc_fn = jsp.erf, jsp.erfc
    else:
        gamma_fn = _np_unary_vec(math.gamma)
        erf_fn = _np_unary_vec(math.erf)
        erfc_fn = _np_unary_vec(math.erfc)

    F = gtir.NativeFunction
    return {
        F.ABS: xp.abs,
        F.MIN: xp.minimum,
        F.MAX: xp.maximum,
        F.MOD: xp.mod,
        F.SIN: xp.sin,
        F.COS: xp.cos,
        F.TAN: xp.tan,
        F.ASIN: xp.arcsin,
        F.ACOS: xp.arccos,
        F.ATAN: xp.arctan,
        F.SINH: xp.sinh,
        F.COSH: xp.cosh,
        F.TANH: xp.tanh,
        F.ASINH: xp.arcsinh,
        F.ACOSH: xp.arccosh,
        F.ATANH: xp.arctanh,
        F.SQRT: xp.sqrt,
        F.CBRT: xp.cbrt,
        F.EXP: xp.exp,
        F.LOG: xp.log,
        F.LOG10: xp.log10,
        F.GAMMA: gamma_fn,
        F.ISFINITE: xp.isfinite,
        F.ISINF: xp.isinf,
        F.ISNAN: xp.isnan,
        F.FLOOR: xp.floor,
        F.CEIL: xp.ceil,
        F.TRUNC: xp.trunc,
        F.ROUND: xp.round,
        F.ROUND_AWAY_FROM_ZERO: lambda x: xp.trunc(x + xp.copysign(xp.asarray(0.5, dtype=_dt(x)), x)),
        F.ERF: erf_fn,
        F.ERFC: erfc_fn,
        F.POW: xp.power,
        F.ATAN2: xp.arctan2,
        F.HYPOT: xp.hypot,
        F.COPYSIGN: xp.copysign,
        F.FMA: lambda a, b, c: a * b + c,
    }


def _dt(x):
    return getattr(x, "dtype", np.float64)


class Evaluator:
    """Executes one analyzed stencil for a concrete (domain, origins) set.

    ``arrays`` maps API field names to full arrays (with halo); temporaries
    are allocated internally. In JAX mode everything here runs inside a
    traced function; all shape-affecting quantities (domain, origins,
    extents) are static.
    """

    def __init__(
        self,
        analyzed: AnalyzedStencil,
        domain: tuple[int, int, int],
        origins: dict[str, tuple[int, int, int]],
        arrays: dict[str, Any],
        scalars: dict[str, Any],
        ns: str,
    ):
        self.analyzed = analyzed
        self.stencil = analyzed.stencil
        self.domain = domain
        self.origins = dict(origins)
        self.arrays = dict(arrays)
        self.scalars = scalars
        self.ops = _NamespaceOps(ns)
        self.natives = _native_impls(self.ops)
        self.dims: dict[str, tuple[bool, bool, bool]] = {}
        self.data_ndims: dict[str, int] = {}
        for p in self.stencil.params:
            if isinstance(p, gtir.FieldDecl):
                self.dims[p.name] = p.dimensions
                self.data_ndims[p.name] = len(p.data_dims)
            elif isinstance(p, gtir.GlobalTableDecl):
                self.dims[p.name] = (False, False, False)
                self.data_ndims[p.name] = len(p.shape)
        self._alloc_temporaries()

    # -- setup ------------------------------------------------------------

    def _alloc_temporaries(self) -> None:
        ni, nj, nk = self.domain
        xp = self.ops.xp
        for t in self.stencil.temporaries:
            ext = self.analyzed.field_extents.get(t.name, Extent.zeros())
            shape = (
                ni + ext.i[1] - ext.i[0],
                nj + ext.j[1] - ext.j[0],
                nk + ext.k[1] - ext.k[0],
            )
            dtype = t.dtype if t.dtype is not None else np.float64
            self.arrays[t.name] = xp.zeros(shape, dtype=dtype)
            self.origins[t.name] = (-ext.i[0], -ext.j[0], -ext.k[0])
            self.dims[t.name] = (True, True, True)
            self.data_ndims[t.name] = 0

    # -- main entry --------------------------------------------------------

    def run(self) -> dict[str, Any]:
        for vloop in self.stencil.vertical_loops:
            if vloop.loop_order == gtir.LoopOrder.PARALLEL:
                self._run_parallel(vloop)
            else:
                self._run_sequential(vloop)
        return self.arrays

    # -- parallel loops ----------------------------------------------------

    def _run_parallel(self, vloop: gtir.VerticalLoop) -> None:
        nk = self.domain[2]
        for section in vloop.sections:
            ks, ke = section.interval.resolve(nk)
            if ke <= ks:
                continue
            for stmt in section.body:
                self._exec_unit(stmt, ks, ke, None)

    # -- sequential loops --------------------------------------------------

    def _run_sequential(self, vloop: gtir.VerticalLoop) -> None:
        nk = self.domain[2]
        backward = vloop.loop_order == gtir.LoopOrder.BACKWARD
        sections = vloop.sections
        for section in sections:
            ks, ke = section.interval.resolve(nk)
            if ke <= ks:
                continue
            length = ke - ks
            if self.ops.kind == "jax" and length > _UNROLL_MAX:
                self._scan_section(section, ks, ke, backward)
            else:
                k_range = range(ks, ke)
                if backward:
                    k_range = reversed(k_range)
                for k in k_range:
                    for stmt in section.body:
                        self._exec_unit(stmt, k, k + 1, k)

    def _scan_section(self, section: gtir.VerticalSection, ks: int, ke: int, backward: bool) -> None:
        import jax.lax as lax
        import jax.numpy as jnp

        written = sorted(
            {w.name for stmt in section.body for w in _unit_writes(stmt)}
        )
        carry0 = tuple(self.arrays[name] for name in written)
        ks_vals = jnp.arange(ks, ke)
        if backward:
            ks_vals = ks_vals[::-1]

        outer_arrays = dict(self.arrays)

        def body(carry, k):
            self.arrays = dict(outer_arrays)
            self.arrays.update(zip(written, carry))
            for stmt in section.body:
                self._exec_unit(stmt, k, k + 1, k)
            return tuple(self.arrays[name] for name in written), None

        final, _ = lax.scan(body, carry0, ks_vals)
        self.arrays = outer_arrays
        self.arrays.update(zip(written, final))

    # -- unit execution ----------------------------------------------------

    def _exec_unit(self, stmt: gtir.Stmt, ks, ke, k_seq) -> None:
        """Execute one lowered unit over K window [ks, ke). ``k_seq`` is the
        current sequential K (possibly traced) or None for PARALLEL."""
        ext = self.analyzed.stmt_extents[stmt]
        ctx = _Ctx(self, ext, ks, ke, k_seq)
        if isinstance(stmt, gtir.Assign):
            self._exec_assign(stmt, ctx)
        elif isinstance(stmt, gtir.While):
            self._exec_while(stmt, ctx)
        else:
            raise TypeError(type(stmt).__name__)

    def _full_mask(self, stmt, ctx: "_Ctx") -> Optional[Any]:
        mask = None
        if stmt.mask is not None:
            mask = self._broadcast(self.eval_expr(stmt.mask, ctx), ctx)
        if stmt.horizontal_masks:
            rmask = self._region_mask(stmt.horizontal_masks, ctx)
            mask = rmask if mask is None else self.ops.xp.logical_and(mask, rmask)
        return mask

    def _exec_assign(self, stmt: gtir.Assign, ctx: "_Ctx") -> None:
        value = self._broadcast(self.eval_expr(stmt.value, ctx), ctx)
        mask = self._full_mask(stmt, ctx)
        self._write(stmt.target, value, mask, ctx)

    def _exec_while(self, stmt: gtir.While, ctx: "_Ctx") -> None:
        xp = self.ops.xp

        involved = sorted(
            {w.name for w in _unit_writes(stmt)}
            | {r.name for r in _unit_reads(stmt) if r.name in self.arrays}
        )

        def eval_mask() -> Any:
            cond = self._broadcast(self.eval_expr(stmt.cond, ctx), ctx)
            extra = self._full_mask(stmt, ctx)
            return cond if extra is None else xp.logical_and(cond, extra)

        def apply_body(mask) -> None:
            for s in stmt.body:
                if isinstance(s, gtir.Assign):
                    value = self._broadcast(self.eval_expr(s.value, ctx), ctx)
                    smask = self._full_mask(s, ctx)
                    total = mask if smask is None else xp.logical_and(mask, smask)
                    self._write(s.target, value, total, ctx)
                elif isinstance(s, gtir.While):
                    raise NotImplementedError("Nested while loops are not supported yet")
                else:
                    raise TypeError(type(s).__name__)

        if self.ops.kind == "numpy":
            mask = eval_mask()
            while bool(np.any(mask)):
                apply_body(mask)
                mask = eval_mask()
            return

        import jax.lax as lax

        def cond_fn(state):
            self.arrays.update(zip(involved, state))
            return self.ops.xp.any(eval_mask())

        def body_fn(state):
            self.arrays.update(zip(involved, state))
            apply_body(eval_mask())
            return tuple(self.arrays[n] for n in involved)

        state0 = tuple(self.arrays[n] for n in involved)
        final = lax.while_loop(cond_fn, body_fn, state0)
        self.arrays.update(zip(involved, final))

    # -- reads/writes ------------------------------------------------------

    def _window_shape(self, ctx: "_Ctx") -> tuple[int, int, int]:
        ni, nj, _ = self.domain
        ext = ctx.ext
        return (
            ni + ext.i[1] - ext.i[0],
            nj + ext.j[1] - ext.j[0],
            ctx.nk_static,
        )

    def _read_field(self, access: gtir.FieldAccess, ctx: "_Ctx") -> Any:
        name = access.name
        arr = self.arrays[name]
        dims = self.dims[name]
        origin = self.origins.get(name, (0, 0, 0))
        di, dj, dk = access.offset
        Ni, Nj, Nk = self._window_shape(ctx)

        if not any(dims):  # GlobalTable: pure data-index lookup
            idx = tuple(self.eval_expr(e, ctx) for e in access.data_index)
            return arr[idx]

        starts = []
        sizes = []
        k_start = None
        if dims[0]:
            starts.append(origin[0] + ctx.ext.i[0] + di)
            sizes.append(Ni)
        if dims[1]:
            starts.append(origin[1] + ctx.ext.j[0] + dj)
            sizes.append(Nj)
        if dims[2]:
            if access.koffset is not None or access.abs_k is not None:
                k_start = "gather"
            else:
                base = ctx.ks if ctx.k_seq is None else ctx.k_seq
                k_start = origin[2] + base + dk
                starts.append(k_start)
                sizes.append(Nk)

        if k_start == "gather":
            # Slice IJ, keep full K, then gather per-point K indices.
            window = self.ops.slice_nd(arr, starts, sizes) if starts else arr
            window = self._expand_missing(window, (dims[0], dims[1], True), Ni, Nj, Nk)
            if window.ndim > 3:
                raise NotImplementedError("Variable-K reads of data-dim fields")
            xp = self.ops.xp
            if access.abs_k is not None:
                kidx = xp.asarray(self.eval_expr(access.abs_k, ctx)) + origin[2]
            else:
                base = ctx.ks if ctx.k_seq is None else ctx.k_seq
                k_iota = self.ops.iota(Nk, 2, None) if ctx.k_seq is None else 0
                koff = self.eval_expr(access.koffset, ctx)
                kidx = xp.asarray(origin[2] + base + dk + k_iota + koff)
            kidx = xp.broadcast_to(kidx.astype(np.int64), (Ni, Nj, Nk))
            value = self.ops.take_along_k(
                xp.broadcast_to(window, (Ni, Nj, window.shape[2])), kidx
            )
        else:
            value = self.ops.slice_nd(arr, starts, sizes)
            value = self._expand_missing(value, dims, Ni, Nj, Nk)

        if access.data_index and any(dims):
            idx = tuple(self._eval_static_index(e, ctx) for e in access.data_index)
            value = value[(Ellipsis,) + idx]
        return value

    def _expand_missing(self, value, dims, Ni, Nj, Nk) -> Any:
        """Insert broadcast axes for absent I/J/K dimensions so every field
        value is (Ni, Nj, Nk, ...data)."""
        axis = 0
        for present in dims:
            if not present:
                value = self.ops.xp.expand_dims(value, axis)
            axis += 1
        return value

    def _eval_static_index(self, expr: gtir.Expr, ctx: "_Ctx"):
        value = self.eval_expr(expr, ctx)
        if isinstance(value, np.ndarray) and value.ndim == 0:
            return int(value)
        if isinstance(value, (int, np.integer)):
            return int(value)
        if hasattr(value, "ndim") and value.ndim == 0:
            return value  # traced scalar index
        raise NotImplementedError("Per-gridpoint data-dimension indices are not supported")

    def _write(self, target: gtir.FieldAccess, value, mask, ctx: "_Ctx") -> None:
        name = target.name
        arr = self.arrays[name]
        dims = self.dims[name]
        origin = self.origins.get(name, (0, 0, 0))
        Ni, Nj, Nk = self._window_shape(ctx)

        value = self.ops.xp.broadcast_to(
            self.ops.xp.asarray(value, dtype=arr.dtype), (Ni, Nj, Nk)
        )

        starts = []
        shape_out = []
        if dims[0]:
            starts.append(origin[0] + ctx.ext.i[0])
            shape_out.append(Ni)
        if dims[1]:
            starts.append(origin[1] + ctx.ext.j[0])
            shape_out.append(Nj)
        if dims[2]:
            base = ctx.ks if ctx.k_seq is None else ctx.k_seq
            starts.append(origin[2] + base)
            shape_out.append(Nk)
        elif Nk != 1:
            raise NotImplementedError(
                f"Writing field '{name}' without K axis over a multi-level section"
            )

        # Collapse the value to the target's axes.
        squeeze_axes = tuple(i for i, present in enumerate(dims) if not present)
        if squeeze_axes:
            value = self.ops.xp.squeeze(value, axis=squeeze_axes)

        if mask is not None:
            old = self.ops.slice_nd(arr, starts, shape_out)
            if target.data_index:
                idx = tuple(self._eval_static_index(e, ctx) for e in target.data_index)
                old_elem = old[(Ellipsis,) + idx]
                sel = self.ops.xp.where(_match(mask, value), value, old_elem)
                if self.ops.kind == "numpy":
                    old[(Ellipsis,) + idx] = sel
                    new = old
                else:
                    new = old.at[(Ellipsis,) + idx].set(sel)
            else:
                new = self.ops.xp.where(_match(mask, value), value, old)
            self.arrays[name] = self.ops.update_nd(arr, starts, new)
        else:
            if target.data_index:
                idx = tuple(self._eval_static_index(e, ctx) for e in target.data_index)
                old = self.ops.slice_nd(arr, starts, shape_out)
                if self.ops.kind == "numpy":
                    old[(Ellipsis,) + idx] = value
                    block = old
                else:
                    block = old.at[(Ellipsis,) + idx].set(value)
                self.arrays[name] = self.ops.update_nd(arr, starts, block)
            else:
                self.arrays[name] = self.ops.update_nd(arr, starts, value)

    def _region_mask(self, hmasks, ctx: "_Ctx") -> Any:
        xp = self.ops.xp
        ni, nj, _ = self.domain
        Ni, Nj, Nk = self._window_shape(ctx)
        i_rel = self.ops.iota(Ni, 0, None) + ctx.ext.i[0]
        j_rel = self.ops.iota(Nj, 1, None) + ctx.ext.j[0]
        total = None
        for hm in hmasks:
            cond = xp.ones((1, 1, 1), dtype=bool)
            for rel, interval, size in ((i_rel, hm.i, ni), (j_rel, hm.j, nj)):
                if interval.start is not None:
                    cond = xp.logical_and(cond, rel >= interval.start.resolve(size))
                if interval.end is not None:
                    cond = xp.logical_and(cond, rel < interval.end.resolve(size))
            total = cond if total is None else xp.logical_and(total, cond)
        return xp.broadcast_to(total, (Ni, Nj, Nk))

    def _broadcast(self, value, ctx: "_Ctx") -> Any:
        shape = self._window_shape(ctx)
        return self.ops.xp.broadcast_to(self.ops.xp.asarray(value), shape)

    # -- expression evaluation --------------------------------------------

    def eval_expr(self, expr: gtir.Expr, ctx: "_Ctx") -> Any:
        xp = self.ops.xp
        if isinstance(expr, gtir.Literal):
            return np.asarray(expr.value, dtype=expr.dtype)[()]
        if isinstance(expr, gtir.ScalarAccess):
            return self.scalars[expr.name]
        if isinstance(expr, gtir.FieldAccess):
            return self._read_field(expr, ctx)
        if isinstance(expr, gtir.UnaryOp):
            v = self.eval_expr(expr.expr, ctx)
            if expr.op == gtir.UnaryOperator.NOT:
                return xp.logical_not(v)
            if expr.op == gtir.UnaryOperator.NEG:
                return xp.negative(v)
            return v
        if isinstance(expr, gtir.BinaryOp):
            left = self.eval_expr(expr.left, ctx)
            right = self.eval_expr(expr.right, ctx)
            return _apply_binop(xp, expr.op, left, right)
        if isinstance(expr, gtir.TernaryOp):
            cond = self.eval_expr(expr.cond, ctx)
            t = self.eval_expr(expr.true_expr, ctx)
            f = self.eval_expr(expr.false_expr, ctx)
            return xp.where(cond, t, f)
        if isinstance(expr, gtir.NativeFuncCall):
            args = [self.eval_expr(a, ctx) for a in expr.args]
            return self.natives[expr.func](*args)
        if isinstance(expr, gtir.Cast):
            v = self.eval_expr(expr.expr, ctx)
            return xp.asarray(v).astype(expr.dtype)
        raise TypeError(type(expr).__name__)


def _match(mask, value):
    return mask


def _apply_binop(xp, op, left, right):
    A = gtir.ArithmeticOperator
    C = gtir.ComparisonOperator
    L = gtir.LogicalOperator
    if op == A.ADD:
        return xp.add(left, right)
    if op == A.SUB:
        return xp.subtract(left, right)
    if op == A.MUL:
        return xp.multiply(left, right)
    if op == A.DIV:
        return xp.true_divide(left, right)
    if op == A.MOD:
        return xp.mod(left, right)
    if op == A.POW:
        return xp.power(left, right)
    if op == A.MATMUL:
        raise NotImplementedError("'@' on data-dimension fields is not supported yet")
    if op == C.EQ:
        return xp.equal(left, right)
    if op == C.NE:
        return xp.not_equal(left, right)
    if op == C.LT:
        return xp.less(left, right)
    if op == C.LE:
        return xp.less_equal(left, right)
    if op == C.GT:
        return xp.greater(left, right)
    if op == C.GE:
        return xp.greater_equal(left, right)
    if op == L.AND:
        return xp.logical_and(left, right)
    if op == L.OR:
        return xp.logical_or(left, right)
    raise TypeError(op)


class _Ctx:
    """Evaluation context for one unit: extent + K window."""

    __slots__ = ("ev", "ext", "ks", "ke", "k_seq", "nk_static")

    def __init__(self, ev: Evaluator, ext: Extent, ks, ke, k_seq):
        self.ev = ev
        self.ext = ext
        self.ks = ks
        self.ke = ke
        self.k_seq = k_seq
        # Window length along K: static in both modes (sequential → 1).
        self.nk_static = 1 if k_seq is not None else int(ke - ks)


def _unit_writes(stmt: gtir.Stmt):
    from gt4py_tpu.cartesian.passes.extents import iter_writes

    yield from iter_writes(stmt)


def _unit_reads(stmt: gtir.Stmt):
    from gt4py_tpu.cartesian.passes.extents import _iter_reads

    yield from _iter_reads(stmt)
