"""Deep Field-object API suite — reference-parity semantics.

Ports the behavioral checklist of the reference's
``tests/next_tests/unit_tests/embedded_tests/test_nd_array_field.py``
(1,803 LoC: buffer info, math-builtin matrices, where/binary-op domain
intersection, absolute indexing, premap corner cases, inverse-image
errors, pickle, jit/pytree roundtrips) against this framework's
``gt4py_tpu.next.embedded.Field`` directly — the object level below the
``@field_operator`` DSL that the existing execution suites exercise.
"""

import operator
import pickle

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from gt4py_tpu.next import fbuiltins
from gt4py_tpu.next.common import (
    Connectivity,
    Dimension,
    DimensionKind,
    Domain,
    FieldOffset,
    NamedRange,
    UnitRange,
)
from gt4py_tpu.next.constructors import as_connectivity, as_field
from gt4py_tpu.next.embedded import Field, offset_provider_context as offset_provider

IDim = Dimension("IDim")
JDim = Dimension("JDim")
KDim = Dimension("KDim", kind=DimensionKind.VERTICAL)
Vertex = Dimension("Vertex")
Edge = Dimension("Edge")
E2VDim = Dimension("E2V", kind=DimensionKind.LOCAL)


def f_ij(data, i0=0, j0=0):
    data = np.asarray(data)
    return Field(
        Domain(
            NamedRange(IDim, UnitRange(i0, i0 + data.shape[0])),
            NamedRange(JDim, UnitRange(j0, j0 + data.shape[1])),
        ),
        jnp.asarray(data),
    )


# --- buffer info --------------------------------------------------------------


def test_field_buffer_info():
    data = np.random.default_rng(0).normal(size=(4, 5))
    f = f_ij(data)
    assert f.shape == (4, 5)
    assert f.dims == (IDim, JDim)
    assert f.dtype == np.float64
    np.testing.assert_allclose(f.asnumpy(), data)


def test_as_field_roundtrip_with_origin():
    data = np.arange(12.0).reshape(3, 4)
    f = as_field((IDim, JDim), data, origin={IDim: 1, JDim: 2})
    assert f.domain[IDim].unit_range == UnitRange(-1, 2)
    assert f.domain[JDim].unit_range == UnitRange(-2, 2)
    np.testing.assert_allclose(f.asnumpy(), data)


# --- math builtins vs numpy oracle -------------------------------------------

_UNARY_CASES = [
    ("abs", [-1.5, 0.0, 2.5]),
    ("sin", [0.0, 0.5, 1.0]),
    ("cos", [0.0, 0.5, 1.0]),
    ("tan", [0.0, 0.4]),
    ("arcsin", [-0.5, 0.0, 0.5]),
    ("arccos", [-0.5, 0.0, 0.5]),
    ("arctan", [-2.0, 0.0, 3.0]),
    ("sinh", [-1.0, 0.0, 1.0]),
    ("cosh", [-1.0, 0.0, 1.0]),
    ("tanh", [-1.0, 0.0, 1.0]),
    ("arcsinh", [-1.0, 0.0, 1.0]),
    ("arccosh", [1.0, 2.0, 10.0]),
    ("arctanh", [-0.5, 0.0, 0.5]),
    ("sqrt", [0.0, 2.0, 9.0]),
    ("cbrt", [-8.0, 0.0, 27.0]),
    ("exp", [-1.0, 0.0, 1.0]),
    ("log", [0.5, 1.0, np.e]),
    ("floor", [-1.5, 0.0, 2.7]),
    ("ceil", [-1.5, 0.0, 2.2]),
    ("trunc", [-1.7, 0.0, 2.7]),
]


@pytest.mark.parametrize("name, values", _UNARY_CASES)
def test_math_function_builtins(name, values):
    data = np.asarray(values, dtype=np.float64).reshape(-1, 1)
    f = f_ij(data)
    result = getattr(fbuiltins, name)(f)
    expected = getattr(np, name)(data)
    assert isinstance(result, Field)
    assert result.domain == f.domain
    np.testing.assert_allclose(result.asnumpy(), expected, rtol=1e-6)


@pytest.mark.parametrize("name", ["minimum", "maximum"])
def test_binary_math_builtins(name):
    a = f_ij([[1.0, 5.0], [3.0, -2.0]])
    b = f_ij([[2.0, 4.0], [-3.0, 7.0]])
    result = getattr(fbuiltins, name)(a, b)
    expected = getattr(np, name)(a.asnumpy(), b.asnumpy())
    np.testing.assert_allclose(result.asnumpy(), expected)


def test_gamma_builtin():
    import math

    f = f_ij([[1.0, 2.0], [3.0, 4.5]])
    result = fbuiltins.gamma(f)
    expected = np.vectorize(math.gamma)(f.asnumpy())
    np.testing.assert_allclose(result.asnumpy(), expected, rtol=1e-6)


# --- where ------------------------------------------------------------------


def test_where_builtin():
    cond = f_ij(np.asarray([[True, False], [False, True]]))
    a = f_ij([[1.0, 2.0], [3.0, 4.0]])
    b = f_ij([[10.0, 20.0], [30.0, 40.0]])
    result = fbuiltins.where(cond, a, b)
    np.testing.assert_allclose(result.asnumpy(), [[1.0, 20.0], [30.0, 4.0]])


def test_where_builtin_different_domain():
    # branches over shifted domains: result covers the intersection
    cond = f_ij(np.asarray([[True, False, True]] * 3))
    a = f_ij(np.arange(9.0).reshape(3, 3), i0=1)  # IDim in [1, 4)
    b = f_ij(np.zeros((3, 3)))  # IDim in [0, 3)
    result = fbuiltins.where(cond, a, b)
    assert result.domain[IDim].unit_range == UnitRange(1, 3)
    expected = np.where(
        cond.asnumpy()[1:, :], a.asnumpy()[:-1, :], b.asnumpy()[1:, :]
    )
    np.testing.assert_allclose(result.asnumpy(), expected)


def test_where_builtin_with_tuple():
    cond = f_ij(np.asarray([[True, False]]))
    a = (f_ij([[1.0, 2.0]]), f_ij([[5.0, 6.0]]))
    b = (f_ij([[10.0, 20.0]]), f_ij([[50.0, 60.0]]))
    r1, r2 = fbuiltins.where(cond, a, b)
    np.testing.assert_allclose(r1.asnumpy(), [[1.0, 20.0]])
    np.testing.assert_allclose(r2.asnumpy(), [[5.0, 60.0]])


def test_where_tuple_structure_mismatch():
    cond = f_ij(np.asarray([[True]]))
    with pytest.raises(TypeError, match="matching structure"):
        fbuiltins.where(cond, (f_ij([[1.0]]),), (f_ij([[1.0]]), f_ij([[2.0]])))


# --- binary / unary op matrices ----------------------------------------------

_BINARY_OPS = [
    operator.add,
    operator.sub,
    operator.mul,
    operator.truediv,
    operator.floordiv,
    operator.mod,
    operator.pow,
]


@pytest.mark.parametrize("op", _BINARY_OPS)
def test_binary_arithmetic_ops(op):
    a_np = np.asarray([[1.5, 2.0], [3.0, 4.25]])
    b_np = np.asarray([[2.0, 0.5], [1.25, 2.0]])
    result = op(f_ij(a_np), f_ij(b_np))
    np.testing.assert_allclose(result.asnumpy(), op(a_np, b_np), rtol=1e-6)


@pytest.mark.parametrize("op", _BINARY_OPS[:4])
def test_binary_ops_with_scalar_both_sides(op):
    a_np = np.asarray([[1.5, 2.0], [3.0, 4.25]])
    np.testing.assert_allclose(op(f_ij(a_np), 2.0).asnumpy(), op(a_np, 2.0))
    np.testing.assert_allclose(op(2.0, f_ij(a_np)).asnumpy(), op(2.0, a_np))


@pytest.mark.parametrize("op", [operator.and_, operator.or_, operator.xor])
def test_binary_logical_ops(op):
    a_np = np.asarray([[True, False], [True, True]])
    b_np = np.asarray([[False, False], [True, False]])
    result = op(f_ij(a_np), f_ij(b_np))
    np.testing.assert_array_equal(result.asnumpy(), op(a_np, b_np))


def test_unary_ops():
    a_np = np.asarray([[1.5, -2.0], [-3.0, 4.25]])
    f = f_ij(a_np)
    np.testing.assert_allclose((-f).asnumpy(), -a_np)
    np.testing.assert_allclose((+f).asnumpy(), a_np)
    np.testing.assert_allclose(abs(f).asnumpy(), np.abs(a_np))
    b = f_ij(np.asarray([[True, False], [False, True]]))
    np.testing.assert_array_equal((~b).asnumpy(), ~np.asarray([[True, False], [False, True]]))


@pytest.mark.parametrize(
    "op", [operator.eq, operator.ne, operator.lt, operator.le, operator.gt, operator.ge]
)
def test_comparison_ops_produce_bool_fields(op):
    a_np = np.asarray([[1.0, 2.0], [3.0, 4.0]])
    b_np = np.asarray([[2.0, 2.0], [1.0, 5.0]])
    result = op(f_ij(a_np), f_ij(b_np))
    assert isinstance(result, Field)
    assert result.dtype == np.bool_
    np.testing.assert_array_equal(result.asnumpy(), op(a_np, b_np))


def test_binary_operations_with_intersection():
    # overlapping domains: the result lives on the intersection
    a = f_ij(np.arange(16.0).reshape(4, 4))  # I in [0,4)
    b = f_ij(np.ones((4, 4)), i0=2)  # I in [2,6)
    result = f_ij(np.arange(16.0).reshape(4, 4)) + b
    assert result.domain[IDim].unit_range == UnitRange(2, 4)
    assert result.domain[JDim].unit_range == UnitRange(0, 4)
    np.testing.assert_allclose(result.asnumpy(), a.asnumpy()[2:4, :] + 1.0)


def test_binary_operations_different_dims_broadcast():
    # I-only field + J-only field -> I x J field
    fi = Field(
        Domain(NamedRange(IDim, UnitRange(0, 3))), jnp.asarray([1.0, 2.0, 3.0])
    )
    fj = Field(
        Domain(NamedRange(JDim, UnitRange(0, 2))), jnp.asarray([10.0, 20.0])
    )
    result = fi + fj
    assert result.dims == (IDim, JDim)
    np.testing.assert_allclose(
        result.asnumpy(), np.asarray([1.0, 2.0, 3.0])[:, None] + [10.0, 20.0]
    )


# --- as_scalar / astype ------------------------------------------------------


def test_as_scalar():
    f = Field(Domain(), jnp.asarray(7.25))
    assert float(f.as_scalar()) == 7.25
    with pytest.raises(ValueError, match="zero-dimensional"):
        f_ij([[1.0]]).as_scalar()


@pytest.mark.parametrize(
    "dtype, expected",
    [
        (np.float32, np.float32),
        (np.int32, np.int32),
        (bool, np.bool_),
        (int, np.int64),
        (float, np.float64),
    ],
)
def test_astype(dtype, expected):
    f = f_ij([[1.0, 0.0], [2.0, 3.0]])
    assert fbuiltins.astype(f, dtype).dtype == np.dtype(expected)


def test_astype_tuple_overload():
    f = f_ij([[1.0]])
    r1, r2 = fbuiltins.astype((f, f), np.float32)
    assert r1.dtype == np.float32 and r2.dtype == np.float32


# --- broadcast ---------------------------------------------------------------


def test_field_broadcast_scalar():
    f = fbuiltins.broadcast(3.0, (IDim, JDim))
    assert f.dims == (IDim, JDim)
    # placeholder ranges resolve via intersection with a concrete field
    g = f_ij(np.zeros((2, 3)))
    result = g + f
    assert result.domain == g.domain
    np.testing.assert_allclose(result.asnumpy(), 3.0)


def test_field_broadcast_adds_dims():
    fi = Field(
        Domain(NamedRange(IDim, UnitRange(0, 3))), jnp.asarray([1.0, 2.0, 3.0])
    )
    f = fbuiltins.broadcast(fi, (IDim, JDim))
    assert f.dims == (IDim, JDim)
    g = f_ij(np.zeros((3, 4)))
    result = g + f
    np.testing.assert_allclose(
        result.asnumpy(), np.broadcast_to([[1.0], [2.0], [3.0]], (3, 4))
    )


# --- absolute indexing -------------------------------------------------------


@pytest.fixture
def f3():
    return Field(
        Domain(
            NamedRange(IDim, UnitRange(0, 4)),
            NamedRange(JDim, UnitRange(2, 6)),
            NamedRange(KDim, UnitRange(10, 13)),
        ),
        jnp.asarray(np.arange(4 * 4 * 3, dtype=np.float64).reshape(4, 4, 3)),
    )


def test_absolute_indexing_named_range(f3):
    r = f3[NamedRange(IDim, UnitRange(1, 3))]
    assert r.shape == (2, 4, 3)
    assert r.domain[IDim].unit_range == UnitRange(1, 3)
    np.testing.assert_allclose(r.asnumpy(), f3.asnumpy()[1:3])


def test_absolute_indexing_pair_range(f3):
    r = f3[(JDim, (3, 5))]
    assert r.shape == (4, 2, 3)
    assert r.domain[JDim].unit_range == UnitRange(3, 5)
    np.testing.assert_allclose(r.asnumpy(), f3.asnumpy()[:, 1:3, :])


def test_absolute_indexing_multiple_entries(f3):
    r = f3[NamedRange(IDim, UnitRange(1, 2)), NamedRange(KDim, UnitRange(11, 13))]
    assert r.shape == (1, 4, 2)
    np.testing.assert_allclose(r.asnumpy(), f3.asnumpy()[1:2, :, 1:3])


def test_absolute_indexing_collapse_dim(f3):
    r = f3[(KDim, 11)]
    assert isinstance(r, Field)
    assert r.dims == (IDim, JDim)
    np.testing.assert_allclose(r.asnumpy(), f3.asnumpy()[:, :, 1])


def test_absolute_indexing_value_return(f3):
    v = f3[(IDim, 1)][(JDim, 2)][(KDim, 10)]
    assert float(v) == float(f3.asnumpy()[1, 0, 0])


def test_absolute_indexing_out_of_bounds(f3):
    with pytest.raises(IndexError):
        f3[(KDim, 9)]
    with pytest.raises(IndexError):
        f3[NamedRange(IDim, UnitRange(2, 6))]


def test_absolute_indexing_wrong_dim(f3):
    with pytest.raises(KeyError):
        f3[NamedRange(Dimension("Missing"), UnitRange(0, 1))]


def test_indexing_invalid_type(f3):
    with pytest.raises(TypeError):
        f3["nope"]


def test_restrict_matches_getitem(f3):
    assert f3.restrict({IDim: (1, 3)}).domain == f3[(IDim, (1, 3))].domain


# --- premap corner cases -----------------------------------------------------


def test_remapping_premap():
    v_data = np.asarray([10.0, 20.0, 30.0, 40.0])
    vf = Field(Domain(NamedRange(Vertex, UnitRange(0, 4))), jnp.asarray(v_data))
    table = np.asarray([[0, 1], [1, 2], [2, 3]], dtype=np.int32)
    e2v = as_connectivity((Edge, E2VDim), Vertex, table)
    remapped = vf(e2v)
    assert remapped.dims == (Edge, E2VDim)
    np.testing.assert_allclose(remapped.asnumpy(), v_data[table])


def test_premap_offset_provider_lookup():
    E2V = FieldOffset("E2V", source=Vertex, target=(Edge, E2VDim))
    v_data = np.asarray([1.0, 2.0, 3.0])
    vf = Field(Domain(NamedRange(Vertex, UnitRange(0, 3))), jnp.asarray(v_data))
    table = np.asarray([[0, 1], [2, 0]], dtype=np.int32)
    conn = as_connectivity((Edge, E2VDim), Vertex, table)
    with offset_provider({"E2V": conn}):
        remapped = vf(E2V)
    np.testing.assert_allclose(remapped.asnumpy(), v_data[table])


def test_premap_single_neighbor_column():
    E2V = FieldOffset("E2V", source=Vertex, target=(Edge, E2VDim))
    v_data = np.asarray([1.0, 2.0, 3.0])
    vf = Field(Domain(NamedRange(Vertex, UnitRange(0, 3))), jnp.asarray(v_data))
    table = np.asarray([[0, 1], [2, 0]], dtype=np.int32)
    conn = as_connectivity((Edge, E2VDim), Vertex, table)
    with offset_provider({"E2V": conn}):
        col = vf(E2V[1])
    assert col.dims == (Edge,)
    np.testing.assert_allclose(col.asnumpy(), v_data[table[:, 1]])


def test_premap_missing_provider_raises():
    E2V = FieldOffset("E2V", source=Vertex, target=(Edge, E2VDim))
    vf = Field(Domain(NamedRange(Vertex, UnitRange(0, 3))), jnp.asarray([1.0, 2.0, 3.0]))
    with offset_provider({}):
        with pytest.raises(RuntimeError, match="not found in offset_provider"):
            vf(E2V)


def test_cartesian_offset_requires_index():
    Ioff = FieldOffset("Ioff", source=IDim, target=(IDim,))
    f = f_ij(np.zeros((2, 2)))
    with offset_provider({"Ioff": IDim}):
        with pytest.raises(ValueError, match="requires an index"):
            f(Ioff)


def test_skip_value_connectivity_masks():
    v_data = np.asarray([1.0, 2.0, 3.0])
    vf = Field(Domain(NamedRange(Vertex, UnitRange(0, 3))), jnp.asarray(v_data))
    table = np.asarray([[0, -1], [1, 2]], dtype=np.int32)
    conn = as_connectivity((Edge, E2VDim), Vertex, table, skip_value=-1)
    remapped = vf(conn)
    summed = fbuiltins.neighbor_sum(remapped, axis=E2VDim)
    np.testing.assert_allclose(summed.asnumpy(), [1.0, 5.0])


# --- inverse image -----------------------------------------------------------


def test_connectivity_inverse_image_contiguous():
    table = np.asarray([[0, 0], [1, 1], [2, 2]], dtype=np.int32)
    conn = as_connectivity((Edge, E2VDim), Vertex, table)
    assert conn.inverse_image(UnitRange(0, 2)) == UnitRange(0, 2)


def test_connectivity_inverse_image_non_contiguous_raises():
    # rows with all neighbors inside [0, 3) are {0, 2} — not contiguous
    table = np.asarray([[0], [5], [1]], dtype=np.int32)
    conn = as_connectivity((Edge, E2VDim), Vertex, table)
    with pytest.raises(ValueError, match="contiguous"):
        conn.inverse_image(UnitRange(0, 3))


# --- pickle / jit / pytree ---------------------------------------------------


def test_field_pickle_roundtrip():
    f = f_ij(np.arange(6.0).reshape(2, 3), i0=1, j0=2)
    g = pickle.loads(pickle.dumps(f))
    assert g.domain == f.domain
    np.testing.assert_allclose(g.asnumpy(), f.asnumpy())


def test_jax_jit_field_arguments():
    @jax.jit
    def double(field):
        return field + field

    f = f_ij(np.arange(4.0).reshape(2, 2), i0=3)
    result = double(f)
    assert isinstance(result, Field)
    assert result.domain == f.domain
    np.testing.assert_allclose(result.asnumpy(), 2 * f.asnumpy())


def test_jax_pytree_roundtrip():
    f = f_ij(np.arange(4.0).reshape(2, 2), j0=5)
    leaves, treedef = jax.tree_util.tree_flatten(f)
    g = jax.tree_util.tree_unflatten(treedef, leaves)
    assert g.domain == f.domain
    np.testing.assert_allclose(g.asnumpy(), f.asnumpy())


def test_jit_retrace_only_on_domain_change():
    traces = []

    @jax.jit
    def op(field):
        traces.append(1)
        return field * 2.0

    f1 = f_ij(np.zeros((2, 2)))
    f2 = f_ij(np.ones((2, 2)))  # same domain -> cached trace
    f3 = f_ij(np.ones((2, 2)), i0=1)  # shifted domain -> new trace
    op(f1), op(f2), op(f3)
    assert len(traces) == 2
