"""Field-operator builtins (reference: gt4py.next.ffront.fbuiltins,
/root/reference/src/gt4py/next/ffront/fbuiltins.py:254-433): neighbor
reductions, ``broadcast``, ``where``, ``astype`` and the math vocabulary,
all eagerly executable on embedded JAX fields (and therefore traceable
under jit)."""

from __future__ import annotations

from typing import Any, Union

import numpy as np

from gt4py_tpu.next.common import Dimension, Domain, NamedRange, UnitRange
from gt4py_tpu.next.embedded import Field, _promote_dims, _xp


def _is_sym(x) -> bool:
    return getattr(x, "_gt_symbolic_", False)


def _reduce(field: Field, axis: Dimension, op: str, neutral) -> Field:
    if _is_sym(field):
        from gt4py_tpu.next.cartesian_bridge import BridgeUnsupported

        raise BridgeUnsupported("neighbor reductions are unstructured")
    if not isinstance(field, Field):
        raise TypeError("neighbor reductions require a Field")
    ax = field.domain.index(axis)
    arr = field.ndarray
    xp = _xp(arr)
    new_domain = Domain(field.domain.ranges[:ax] + field.domain.ranges[ax + 1:])
    # Lazy neighbor parts (embedded._remap_connectivity): reduce the
    # unstacked per-column arrays directly — a chain of elementwise ops
    # XLA fuses end-to-end — instead of reducing over the materialized
    # (n_src, ncols) stack (which then dead-codes away).
    parts_info = getattr(field, "_neighbor_parts", None)
    if (
        parts_info is not None
        and field.mask is None
        and parts_info[0] == axis
        and len(parts_info[1]) == arr.shape[ax]
    ):
        import functools

        combine = {
            "sum": lambda x, y: x + y,
            "max": xp.maximum,
            "min": xp.minimum,
        }[op]
        return Field(new_domain, functools.reduce(combine, parts_info[1]))
    if field.mask is not None:
        arr = xp.where(field.mask, arr, np.asarray(neutral, dtype=field.dtype))
    result = getattr(xp, op)(arr, axis=ax)
    return Field(new_domain, result)


def neighbor_sum(field: Field, axis: Dimension) -> Field:
    """Sum over a LOCAL neighbor dimension with skip-value masking
    (reference fbuiltins.py:255)."""
    return _reduce(field, axis, "sum", 0)


def max_over(field: Field, axis: Dimension) -> Field:
    return _reduce(field, axis, "max", -np.inf)


def min_over(field: Field, axis: Dimension) -> Field:
    return _reduce(field, axis, "min", np.inf)


def broadcast(value: Union[Field, Any], dims: tuple[Dimension, ...]) -> Field:
    if _is_sym(value):
        return value._builtin("broadcast", value)
    """Mark a value as broadcastable over ``dims`` (reference
    fbuiltins.py:270). Embedded: zero-size placeholder ranges get resolved
    by domain intersection in subsequent ops; scalars become 0-d fields
    carrying the dim set."""
    if isinstance(value, Field):
        new_dims = _promote_dims(value.dims, tuple(dims))
        ranges = []
        shape = []
        arr = value.ndarray
        for d in new_dims:
            if d in value.domain:
                ranges.append(value.domain[d])
                shape.append(len(value.domain[d].unit_range))
            else:
                ranges.append(NamedRange(d, UnitRange.infinite()))
                shape.append(1)
        perm = [value.domain.index(d) for d in new_dims if d in value.domain]
        if perm != sorted(perm):
            arr = arr.transpose(perm)
        arr = arr.reshape(shape)
        f = object.__new__(Field)
        f.domain = Domain(tuple(ranges))
        f.ndarray = arr
        f.mask = None
        return f
    import jax.numpy as jnp

    arr = jnp.asarray(value).reshape((1,) * len(dims))
    f = object.__new__(Field)
    f.domain = Domain(tuple(NamedRange(d, UnitRange.infinite()) for d in dims))
    f.ndarray = arr
    f.mask = None
    return f


def where(cond: Field, a: Union[Field, Any], b: Union[Field, Any]) -> Field:
    if isinstance(a, tuple) or isinstance(b, tuple):
        # Tuple overload (reference fbuiltins.py:281): select element-wise
        # with the same condition.
        if not (isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b)):
            raise TypeError("where: tuple branches must have matching structure")
        elts = [where(cond, x, y) for x, y in zip(a, b)]
        # Preserve NamedTuple carries (icon-like scan State pattern).
        return type(a)(*elts) if hasattr(a, "_fields") else tuple(elts)
    for x in (cond, a, b):
        if _is_sym(x):
            return x._builtin("where", cond, a, b)
    """Ternary select (reference fbuiltins.py:281)."""
    operands = [x for x in (cond, a, b) if isinstance(x, Field)]
    if not operands:
        # Raw per-level values (inside a scan_operator body the arguments
        # are plain arrays, not Fields): plain element-wise select.
        import jax.numpy as jnp

        xp = np if all(isinstance(x, (np.ndarray, np.generic, int, float, bool)) for x in (cond, a, b)) else jnp
        return xp.where(cond, a, b)
    dims = operands[0].dims
    for o in operands[1:]:
        dims = _promote_dims(dims, o.dims)

    # Align every operand onto the COMMON intersection domain of all
    # three (pairwise alignment misses narrowing imposed by the third
    # operand when all domains differ — reference
    # test_where_builtin_different_domain semantics).
    target = operands[0].domain
    for o in operands[1:]:
        target = target.intersection(o.domain)
    probe = object.__new__(Field)
    probe.domain = target
    probe.ndarray = operands[0].ndarray
    probe.mask = None

    def align(x):
        if isinstance(x, Field):
            dom, arr = x._aligned(dims, probe)
            return dom, arr
        return None, x

    dom_c, arr_c = align(cond)
    dom_a, arr_a = align(a)
    dom_b, arr_b = align(b)
    dom = dom_c or dom_a or dom_b
    xp = _xp(operands[0].ndarray)
    return Field(dom, xp.where(arr_c, arr_a, arr_b))


def astype(field: Union[Field, Any], dtype: Any) -> Field:
    if isinstance(field, tuple):
        # Tuple overload (reference fbuiltins.py:299): cast element-wise.
        return tuple(astype(f, dtype) for f in field)
    if _is_sym(field):
        return field._builtin("astype", field, dtype)
    import jax.numpy as jnp

    # identity checks: np.dtype('float64') == float is True in numpy
    if dtype is int or dtype is float or dtype is bool:
        np_dtype = np.dtype({int: np.int64, float: np.float64, bool: np.bool_}[dtype])
    else:
        np_dtype = np.dtype(dtype)
    if isinstance(field, Field):
        return Field(field.domain, field.ndarray.astype(np_dtype), field.mask)
    return jnp.asarray(field).astype(np_dtype)


def _field_unary(jnp_name: str):
    def fn(x):
        if _is_sym(x):
            return x._builtin(jnp_name, x)
        if isinstance(x, Field):
            impl = getattr(_xp(x.ndarray), jnp_name)
            return Field(x.domain, impl(x.ndarray), x.mask)
        import jax.numpy as jnp

        return getattr(jnp, jnp_name)(x)

    fn.__name__ = jnp_name
    return fn


def _field_binary(jnp_name: str):
    def fn(x, y):
        if _is_sym(x):
            return x._builtin(jnp_name, x, y)
        if _is_sym(y):
            return y._builtin(jnp_name, x, y)
        if isinstance(x, Field):
            return x._binary(y, getattr(_xp(x.ndarray), jnp_name))
        if isinstance(y, Field):
            return y._rbinary(x, getattr(_xp(y.ndarray), jnp_name))
        if isinstance(x, (int, float, np.generic)) and isinstance(
            y, (int, float, np.generic)
        ):
            # plain scalars stay concrete (e.g. ``minimum(1, 2)`` feeding
            # a program ``domain=`` bound must not become a tracer)
            return getattr(np, jnp_name)(x, y)
        import jax.numpy as jnp

        return getattr(jnp, jnp_name)(x, y)

    fn.__name__ = jnp_name
    return fn


abs = _field_unary("abs")  # noqa: A001
sin = _field_unary("sin")
cos = _field_unary("cos")
tan = _field_unary("tan")
arcsin = _field_unary("arcsin")
arccos = _field_unary("arccos")
arctan = _field_unary("arctan")
sinh = _field_unary("sinh")
cosh = _field_unary("cosh")
tanh = _field_unary("tanh")
arcsinh = _field_unary("arcsinh")
arccosh = _field_unary("arccosh")
arctanh = _field_unary("arctanh")
sqrt = _field_unary("sqrt")
cbrt = _field_unary("cbrt")
exp = _field_unary("exp")
log = _field_unary("log")
floor = _field_unary("floor")
ceil = _field_unary("ceil")
trunc = _field_unary("trunc")
isfinite = _field_unary("isfinite")
isinf = _field_unary("isinf")
isnan = _field_unary("isnan")
minimum = _field_binary("minimum")
maximum = _field_binary("maximum")
fmod = _field_binary("mod")
power = _field_binary("power")


def neg(x):
    """Unary negation as a function (reference fbuiltins.neg)."""
    return -x


def _gamma_array(xp, a):
    if xp is not None and xp.__name__ == "numpy":
        try:
            from scipy.special import gamma as _g

            return _g(a)
        except Exception:
            import math

            return xp.vectorize(math.gamma)(a)
    import jax

    try:
        return jax.scipy.special.gamma(a)
    except AttributeError:
        # Positive-domain fallback: Γ(x) = exp(lgamma(x)).
        import jax.numpy as jnp

        return jnp.exp(jax.lax.lgamma(a))


def gamma(x):
    """Gamma function (reference fbuiltins.gamma / NativeFunction.GAMMA)."""
    if _is_sym(x):
        return x._builtin("gamma", x)
    if isinstance(x, Field):
        xp = _xp(x.ndarray)
        return Field(x.domain, _gamma_array(xp, x.ndarray), x.mask)
    return _gamma_array(None, x)

MATH_BUILTIN_NAMES = [
    "abs", "sin", "cos", "tan", "arcsin", "arccos", "arctan", "sinh", "cosh",
    "tanh", "arcsinh", "arccosh", "arctanh", "sqrt", "cbrt", "exp", "log",
    "floor", "ceil", "trunc", "isfinite", "isinf", "isnan", "minimum",
    "maximum", "fmod", "power", "neg", "gamma",
]

# Scalar-kind aliases usable in DSL annotations (reference
# ffront/fbuiltins.py exports these at package level: gtx.float64 etc.).
import numpy as _np  # noqa: E402


class _TypeConstructor:
    """Dtype alias that is ALSO a constructor cast (reference type
    builtins: ``int64(inp)`` inside an operator casts the field,
    test_type_conversion.py). ``np.dtype()`` accepts it through the
    ``dtype`` attribute protocol, so it keeps working everywhere a dtype
    is expected (``zeros(..., dtype=gtx.float32)``, ``Field[Dims, ...]``
    annotations)."""

    __slots__ = ("np_type", "dtype")

    def __init__(self, np_type):
        self.np_type = np_type
        self.dtype = _np.dtype(np_type)

    def __call__(self, x: Any) -> Any:
        if isinstance(x, (bool, int, float, str, np.generic)):
            return self.np_type(x)
        return astype(x, self.np_type)

    @property
    def __name__(self) -> str:  # builtin-callable protocol (type deduction)
        return self.dtype.name

    def __repr__(self) -> str:  # pragma: no cover — cosmetic
        return f"gt4py_tpu.next.{self.dtype.name}"


bool_ = _TypeConstructor(_np.bool_)
int8 = _TypeConstructor(_np.int8)
int16 = _TypeConstructor(_np.int16)
int32 = _TypeConstructor(_np.int32)
int64 = _TypeConstructor(_np.int64)
uint8 = _TypeConstructor(_np.uint8)
uint16 = _TypeConstructor(_np.uint16)
uint32 = _TypeConstructor(_np.uint32)
uint64 = _TypeConstructor(_np.uint64)
float32 = _TypeConstructor(_np.float32)
float64 = _TypeConstructor(_np.float64)
float16 = _TypeConstructor(_np.float16)

from gt4py_tpu.core.definitions import bfloat16 as _bf16_np  # noqa: E402  (ml_dtypes)

bfloat16 = _TypeConstructor(_bf16_np)

DTYPE_ALIAS_NAMES = [
    "bool_", "int8", "int16", "int32", "int64",
    "uint8", "uint16", "uint32", "uint64", "float32", "float64",
    "float16", "bfloat16",
]


def concat_where(cond, a, b) -> Field:
    """Domain-conditional concatenation (reference experimental
    ``concat_where``, ffront/experimental.py:52): select ``a`` where the
    per-dimension index condition holds (e.g. ``KDim < 1`` for surface
    boundary conditions), ``b`` elsewhere."""
    if isinstance(a, tuple) or isinstance(b, tuple):
        if not (isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b)):
            raise TypeError("concat_where: tuple branches must have matching structure")
        return tuple(concat_where(cond, x, y) for x, y in zip(a, b))
    import jax.numpy as jnp
    from jax import lax

    from gt4py_tpu.next.common import DimCondition

    if not isinstance(cond, DimCondition):
        return where(cond, a, b)
    # Bridge tracing: lower to K-interval sections (straight-line
    # specialized code per vertical piece, cartesian_bridge.concat_k).
    sym = next((x for x in (a, b) if _is_sym(x)), None)
    if sym is not None:
        return sym._builtin("concat_where", cond, a, b)
    operands = [x for x in (a, b) if isinstance(x, Field)]
    if not operands:
        raise TypeError("concat_where requires at least one Field operand")
    dims = operands[0].dims
    for o in operands[1:]:
        dims = _promote_dims(dims, o.dims)
    if cond.dim not in dims:
        raise ValueError(f"Condition dimension {cond.dim} not in operands")

    # Reference semantics (nd_array_field.py:905 ``_concat_where``): the
    # result is the CONCATENATION along the condition dimension of the
    # true field restricted to the condition region(s) and the false
    # field restricted to the complement — each operand only needs to
    # cover its own region (boundary-condition idiom: the interior
    # branch may be shrunk by shifts). Orthogonal dims intersect.
    from gt4py_tpu.next.common import complement_regions

    true_regions = cond.regions
    false_regions = complement_regions(true_regions)

    # Orthogonal intersection over operands that have the dim.
    ortho: dict = {}
    for d in dims:
        if d == cond.dim:
            continue
        rr = None
        for o in operands:
            if d in o.domain:
                orr = o.domain[d].unit_range
                rr = orr if rr is None else rr.intersection(orr)
        ortho[d] = rr if rr is not None else UnitRange.infinite()

    xp = _xp(operands[0].ndarray)
    result_dtype = xp.result_type(
        *(o.ndarray for o in operands),
        *(x for x in (a, b) if not isinstance(x, Field)),
    )

    # Bounding hull along the condition dim (finite operand ranges): a
    # scalar or dim-less contributor covers any region, clipped to the
    # hull so the result stays finite (the reference materializes an
    # infinite ConstantField instead; downstream the out write clips it —
    # reference test_concat_where_scalar_broadcast).
    hull = None
    for o in operands:
        if cond.dim in o.domain:
            orr = o.domain[cond.dim].unit_range
            if orr.is_finite:
                hull = (
                    orr
                    if hull is None
                    else UnitRange(min(hull.start, orr.start), max(hull.stop, orr.stop))
                )

    def contributions(x, regions):
        for reg in regions:
            if isinstance(x, Field) and cond.dim in x.domain and x.domain[
                cond.dim
            ].unit_range.is_finite:
                rr = x.domain[cond.dim].unit_range.intersection(reg)
            elif reg.is_finite:
                rr = reg  # scalar / dim-less branch on a bounded region
            elif hull is not None:
                rr = hull.intersection(reg)
            else:
                rr = reg
            if rr.is_empty():
                continue
            if not rr.is_finite:
                raise ValueError(
                    f"concat_where region {rr} along {cond.dim} is unbounded; "
                    "bound it with a field that has a finite range there"
                )
            yield rr, x

    pieces = sorted(
        [*contributions(a, true_regions), *contributions(b, false_regions)],
        key=lambda p: p[0].start,
    )
    if not pieces:
        raise ValueError("concat_where: no contributing region")
    for (r0, _), (r1, _) in zip(pieces, pieces[1:]):
        if r0.stop < r1.start:
            raise ValueError(
                f"concat_where: non-contiguous result domain along {cond.dim} "
                f"(gap between {r0} and {r1})"
            )
        if r0.stop > r1.start:  # pragma: no cover — regions are disjoint
            raise ValueError("concat_where: overlapping contributions")

    def piece_array(rr: "UnitRange", x) -> Any:
        target_ranges = tuple(
            NamedRange(d, rr if d == cond.dim else ortho[d]) for d in dims
        )
        shape = tuple(
            len(r.unit_range) if r.unit_range.is_finite else 1
            for r in target_ranges
        )
        if not isinstance(x, Field):
            return xp.full(shape, x, dtype=result_dtype)
        probe = object.__new__(Field)
        probe.domain = Domain(target_ranges)
        probe.ndarray = operands[0].ndarray
        probe.mask = None
        probe.base = None
        _, arr = x._aligned(dims, probe)
        return xp.broadcast_to(arr, shape).astype(result_dtype)

    arrays = [piece_array(rr, x) for rr, x in pieces]
    axis = list(dims).index(cond.dim)
    full_range = UnitRange(pieces[0][0].start, pieces[-1][0].stop)
    out_ranges = tuple(
        NamedRange(d, full_range if d == cond.dim else ortho[d]) for d in dims
    )
    return Field(
        Domain(out_ranges),
        arrays[0] if len(arrays) == 1 else xp.concatenate(arrays, axis=axis),
    )
