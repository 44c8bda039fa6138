"""Roll-plan gathers (round-5): structured connectivity columns execute
as ONE cyclic roll of a source window — possibly a 2-axis roll of its
(Q, P) view — instead of K class-rolls + masked selects, and multi-column
remap results keep lazy per-column parts so ``neighbor_sum(remap * w)``
never materializes the (n_src, ncols) stack. Correctness vs the numpy
oracle, plan detection, residual fix-ups, and parts propagation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gt4py_tpu.next as gtx
from gt4py_tpu.next import Dimension, DimensionKind, neighbor_sum, max_over
from gt4py_tpu.next.embedded import (
    _roll_gather_1d,
    _roll_plan,
    _shift_gather_1d,
)

V = Dimension("V")
E = Dimension("E")
V2EDim = Dimension("V2E", kind=DimensionKind.LOCAL)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def quad_mesh_column(m, which):
    """One column of a periodic m x m quad-mesh connectivity, flattened
    row-major: 'i+1' wraps on the outer axis (plain roll of the flat
    array), 'j+1' wraps on the minor axis (2-axis roll, P = m)."""
    n = m * m
    i, j = np.divmod(np.arange(n), m)
    if which == "i+1":
        return (((i + 1) % m) * m + j)[:, None]
    if which == "j+1":
        return (i * m + (j + 1) % m)[:, None]
    raise AssertionError(which)


def test_plain_roll_detected(rng):
    m = 16
    n = m * m
    table = quad_mesh_column(m, "i+1")
    conn = gtx.as_connectivity([V, V2EDim], V, table)
    plan = _roll_plan(conn, 0, 0, n)
    assert plan is not None and plan.res_rows is None
    (tile,) = plan.tiles
    assert tile.P == tile.L  # plain 1-axis roll
    x = jnp.asarray(rng.random(n))
    got = _roll_gather_1d(x, plan)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x)[table[:, 0]])


def test_minor_axis_roll_detected(rng):
    """The j-wrap column is NOT one flat roll (it has period-m class
    structure) but IS a minor-axis roll of the (m, m) view."""
    m = 16
    n = m * m
    table = quad_mesh_column(m, "j+1")
    conn = gtx.as_connectivity([V, V2EDim], V, table)
    plan = _roll_plan(conn, 0, 0, n)
    assert plan is not None and plan.res_rows is None
    (tile,) = plan.tiles
    assert tile.P == m and tile.s == 1 and tile.a == 0
    x = jnp.asarray(rng.random(n))
    got = _roll_gather_1d(x, plan)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x)[table[:, 0]])


def test_tiled_source_and_window(rng):
    """E2V-style column over two target blocks (n_src = 2n): each tile
    gets its own window/roll; V2E-style windows slice the source block
    the targets actually live in."""
    m = 8
    nv = m * m
    # edges: horizontal block targets vid(i, j), vertical block vid(i, j+1)
    i, j = np.divmod(np.arange(nv), m)
    col = np.concatenate([i * m + j, i * m + (j + 1) % m])[:, None]
    conn = gtx.as_connectivity([E, V2EDim], V, col)
    plan = _roll_plan(conn, 0, 0, nv)
    assert plan is not None and len(plan.tiles) == 2 and plan.res_rows is None
    x = jnp.asarray(rng.random(nv))
    np.testing.assert_allclose(
        np.asarray(_roll_gather_1d(x, plan)), np.asarray(x)[col[:, 0]]
    )

    # window case: targets confined to the second half of a long source
    ne = 2 * nv
    half_col = (nv + (np.arange(nv) + 3) % nv)[:, None]
    conn2 = gtx.as_connectivity([V, V2EDim], E, half_col)
    plan2 = _roll_plan(conn2, 0, 0, ne)
    assert plan2 is not None and plan2.res_rows is None
    (tile,) = plan2.tiles
    assert tile.base == nv and tile.L == nv
    y = jnp.asarray(rng.random(ne))
    np.testing.assert_allclose(
        np.asarray(_roll_gather_1d(y, plan2)), np.asarray(y)[half_col[:, 0]]
    )


def test_residual_rows_fixed_up(rng):
    m = 12
    n = m * m
    table = quad_mesh_column(m, "j+1")
    bad = rng.choice(n, size=5, replace=False)
    table[bad, 0] = rng.integers(0, n, size=5)
    conn = gtx.as_connectivity([V, V2EDim], V, table)
    plan = _roll_plan(conn, 0, 0, n)
    assert plan is not None and plan.res_rows is not None
    assert set(plan.res_rows) <= set(bad.tolist())
    x = jnp.asarray(rng.random(n))
    np.testing.assert_allclose(
        np.asarray(_roll_gather_1d(x, plan)), np.asarray(x)[table[:, 0]]
    )
    # and through the public gather entry point
    np.testing.assert_allclose(
        np.asarray(_shift_gather_1d(x, conn, 0, 0)), np.asarray(x)[table[:, 0]]
    )


def test_irregular_column_rejected(rng):
    n = 128
    table = rng.integers(0, n, (n, 1))
    conn = gtx.as_connectivity([V, V2EDim], V, table)
    assert _roll_plan(conn, 0, 0, n) is None


def test_lazy_parts_neighbor_sum_matches_stack(rng):
    """neighbor_sum(remap * sign) through the lazy-parts path equals the
    stacked-oracle result, including scalar and field weights."""
    m = 10
    nv = m * m
    i, j = np.divmod(np.arange(nv), m)
    v2e = np.stack(
        [i * m + j, ((i + 1) % m) * m + j, i * m + (j + 1) % m, ((i - 1) % m) * m + j],
        axis=1,
    )
    conn = gtx.as_connectivity([V, V2EDim], V, v2e)
    V2E = gtx.FieldOffset("V2E", source=V, target=(V, V2EDim))
    x_np = rng.random(nv).astype(np.float32)
    sign_np = rng.choice([-1.0, 1.0], size=(nv, 4)).astype(np.float32)

    from gt4py_tpu.next.embedded import offset_provider_context

    f = gtx.as_field([V], x_np)
    sign = gtx.as_field([V, V2EDim], sign_np)
    with offset_provider_context({"V2E": conn}):
        g = f(V2E)
        assert getattr(g, "_neighbor_parts", None) is not None
        prod = 0.5 * g * sign
        assert getattr(prod, "_neighbor_parts", None) is not None
        out = neighbor_sum(prod, axis=V2EDim)
        mx = max_over(g, axis=V2EDim)
    np.testing.assert_allclose(
        np.asarray(out.ndarray), (0.5 * x_np[v2e] * sign_np).sum(axis=1), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(mx.ndarray), x_np[v2e].max(axis=1), rtol=1e-6)


def test_masked_remap_does_not_carry_parts(rng):
    """skip_value connectivities set a mask — the lazy-parts shortcut must
    stand down so masked reduction semantics stay intact."""
    n = 32
    table = (np.arange(n)[:, None] + np.array([[1, 2]])) % n
    table[4, 1] = -1
    conn = gtx.as_connectivity([V, V2EDim], V, table, skip_value=-1)
    V2E = gtx.FieldOffset("V2E", source=V, target=(V, V2EDim))
    x_np = rng.random(n).astype(np.float32)

    from gt4py_tpu.next.embedded import offset_provider_context

    with offset_provider_context({"V2E": conn}):
        g = gtx.as_field([V], x_np)(V2E)
        assert getattr(g, "_neighbor_parts", None) is None
        out = neighbor_sum(g, axis=V2EDim)
    expected = np.where(table != -1, x_np[np.clip(table, 0, n - 1)], 0.0).sum(axis=1)
    np.testing.assert_allclose(np.asarray(out.ndarray), expected, rtol=1e-6)


def test_parts_dropped_when_alignment_slices(rng):
    """A Field-Field op that narrows the domain must not propagate parts
    (their source axis would no longer match the result)."""
    m = 6
    nv = m * m
    table = quad_mesh_column(m, "i+1")
    conn = gtx.as_connectivity([V, V2EDim], V, np.tile(table, (1, 2)))
    V2E = gtx.FieldOffset("V2E", source=V, target=(V, V2EDim))
    x_np = rng.random(nv).astype(np.float32)

    from gt4py_tpu.next.common import UnitRange, domain as make_domain
    from gt4py_tpu.next.embedded import offset_provider_context

    with offset_provider_context({"V2E": conn}):
        g = gtx.as_field([V], x_np)(V2E)
        assert getattr(g, "_neighbor_parts", None) is not None
        narrower = g[(V, (0, nv - 4))]
        other = gtx.as_field([V, V2EDim], rng.random((nv - 4, 2)).astype(np.float32))
        prod = narrower * other
        # the result was sliced relative to the remap: no parts carried
        assert getattr(prod, "_neighbor_parts", None) is None
        out = neighbor_sum(prod, axis=V2EDim)
    expected = (x_np[np.tile(table, (1, 2))][: nv - 4] * np.asarray(other.ndarray)).sum(
        axis=1
    )
    np.testing.assert_allclose(np.asarray(out.ndarray), expected, rtol=1e-6)


def test_periodic_quad_mesh_matches_loop_builder():
    """mesh_utils.periodic_quad_mesh (vectorized, benchmark-scale) agrees
    with the loop-built reference mesh used across the test suite."""
    from gt4py_tpu.next.mesh_utils import periodic_quad_mesh
    from tests.next_tests.test_field_ops import make_periodic_mesh

    e2v_f, v2e_f, s_f = periodic_quad_mesh(7)
    e2v_l, v2e_l, s_l = make_periodic_mesh(7)
    np.testing.assert_array_equal(e2v_f, e2v_l)
    np.testing.assert_array_equal(v2e_f, v2e_l)
    np.testing.assert_array_equal(s_f, s_l)
