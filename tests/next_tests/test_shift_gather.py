"""Structured-connectivity shift decomposition (round-3, verdict item 1):
connectivity columns whose (target - source) diffs form few cyclic-shift
classes execute as rolls + masked selects instead of per-row gathers.
Correctness vs the general gather path, plan engagement/fallback, and
skip-value handling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gt4py_tpu.next as gtx
from gt4py_tpu.next import Dimension, DimensionKind
from gt4py_tpu.next.embedded import _rowgather_1d, _shift_gather_1d, _shift_plan

V = Dimension("V")
E = Dimension("E")
V2EDim = Dimension("V2E", kind=DimensionKind.LOCAL)


def periodic_ring(n, deg=3):
    """Ring mesh: neighbor j of vertex v is (v + j*2 - 1) mod n — every
    column is a single shift class."""
    table = (np.arange(n)[:, None] + np.arange(deg)[None, :] * 2 - 1) % n
    return table


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def test_single_class_columns_engage(rng):
    n = 64
    table = periodic_ring(n)
    conn = gtx.as_connectivity([V, V2EDim], V, table)
    x = jnp.asarray(rng.random(n))
    for c in range(table.shape[1]):
        plan = _shift_plan(conn, c, 0, n)
        assert plan is not None
        assert len(plan.diffs) == 1  # pure roll
        assert plan.res_rows is None  # fully structured: no fix-up
        got = _shift_gather_1d(x, conn, c, 0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x)[table[:, c]])


def test_blockwise_columns_engage(rng):
    """Block-structured column (periodic quad-mesh style): row-internal
    wrap produces 2-3 shift classes, still on the fast path."""
    m = 8
    n = m * m
    idx = np.arange(n)
    # "left neighbor within row": v - 1 with per-row wrap
    table = (idx - idx % m + (idx % m - 1) % m)[:, None]
    conn = gtx.as_connectivity([V, V2EDim], V, table)
    plan = _shift_plan(conn, 0, 0, n)
    assert plan is not None and 1 < len(plan.diffs) <= 3
    assert plan.res_rows is None
    x = jnp.asarray(rng.random(n))
    got = _shift_gather_1d(x, conn, 0, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x)[table[:, 0]])


def test_irregular_falls_back(rng):
    n = 128
    table = rng.integers(0, n, (n, 1))
    conn = gtx.as_connectivity([V, V2EDim], V, table)
    assert _shift_plan(conn, 0, 0, n) is None
    # and the remap still works through the row-gather path
    x = jnp.asarray(rng.random(n))
    assert _shift_gather_1d(x, conn, 0, 0) is None
    np.testing.assert_allclose(
        np.asarray(_rowgather_1d(x, jnp.asarray(table[:, 0], jnp.int32))),
        np.asarray(x)[table[:, 0]],
    )


def test_source_longer_than_codomain(rng):
    """E2V-style: source (edges) longer than codomain (vertices) — the
    rolled vector tiles to the source length."""
    nv, ne = 32, 64
    # edge e connects vertices (e mod nv, (e+1) mod nv)
    table = np.stack([np.arange(ne) % nv, (np.arange(ne) + 1) % nv], axis=1)
    conn = gtx.as_connectivity([E, V2EDim], V, table)
    x = jnp.asarray(rng.random(nv))
    for c in range(2):
        plan = _shift_plan(conn, c, 0, nv)
        assert plan is not None
        got = _shift_gather_1d(x, conn, c, 0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x)[table[:, c]])


def test_skip_values_masked(rng):
    n = 16
    table = (np.arange(n)[:, None] + np.array([[1, -1]])) % n
    table[3, 1] = -1  # skip marker breaks the pure-shift class for row 3
    conn = gtx.as_connectivity([V, V2EDim], V, table, skip_value=-1)
    x_np = rng.random(n)
    f = gtx.as_field([V], x_np)
    remapped = f._remap_connectivity(conn)
    got = np.asarray(remapped.ndarray)
    mask = np.asarray(remapped.mask)
    expected = x_np[np.clip(table, 0, n - 1)]
    assert mask[3, 1] == False  # noqa: E712
    valid = np.asarray(table) != -1
    np.testing.assert_allclose(got[valid], expected[valid])


def test_perturbed_structured_hybrid(rng):
    """MOSTLY-structured column (mesh boundary / refinement patches): a few
    percent of rows are rewired arbitrarily. The plan keeps the rolls for
    the majority and fixes the rewired rows up with a sparse row-gather +
    scatter — still off the full per-row gather path."""
    n = 256
    table = periodic_ring(n)
    bad = rng.choice(n, size=8, replace=False)  # ~3% of one column
    table[bad, 0] = rng.integers(0, n, size=8)
    conn = gtx.as_connectivity([V, V2EDim], V, table)
    plan = _shift_plan(conn, 0, 0, n)
    assert plan is not None
    assert plan.res_rows is not None
    # residual holds exactly the rewired rows that left their class
    assert set(plan.res_rows) <= set(bad.tolist())
    x = jnp.asarray(rng.random(n))
    got = _shift_gather_1d(x, conn, 0, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x)[table[:, 0]])


def test_out_of_range_rows_served_by_clamped_fixup(rng):
    """Out-of-range neighbors (clamped by the general gather) no longer
    disqualify the column — they join the residual fix-up, which clamps
    identically."""
    n = 64
    table = periodic_ring(n)
    table[5, 0] = n + 7  # past the codomain: fallback clamps to n-1
    table[9, 0] = n + 1
    conn = gtx.as_connectivity([V, V2EDim], V, table)
    plan = _shift_plan(conn, 0, 0, n)
    assert plan is not None and plan.res_rows is not None
    assert {5, 9} == set(plan.res_rows.tolist())
    x = jnp.asarray(rng.random(n))
    got = _shift_gather_1d(x, conn, 0, 0)
    expected = np.asarray(x)[np.clip(table[:, 0], 0, n - 1)]
    np.testing.assert_allclose(np.asarray(got), expected)


def test_residual_fraction_cap(rng):
    """Above the residual budget the plan declines and the row-gather path
    serves the whole column."""
    n = 200
    table = periodic_ring(n)
    bad = rng.choice(n, size=int(0.4 * n), replace=False)
    table[bad, 0] = rng.integers(0, n, size=len(bad))
    conn = gtx.as_connectivity([V, V2EDim], V, table)
    assert _shift_plan(conn, 0, 0, n) is None


def test_skip_rows_excluded_from_residual(rng):
    """Skip-value rows are masked downstream — they must neither form a
    shift class nor join the fix-up."""
    n = 32
    table = periodic_ring(n)
    table[4, 0] = -1
    table[11, 0] = 999  # out of range AND needs fix-up
    conn = gtx.as_connectivity([V, V2EDim], V, table, skip_value=-1)
    plan = _shift_plan(conn, 0, 0, n)
    assert plan is not None
    assert plan.res_rows is not None and plan.res_rows.tolist() == [11]
    x_np = rng.random(n)
    f = gtx.as_field([V], x_np)
    remapped = f._remap_connectivity(conn)
    mask = np.asarray(remapped.mask)
    assert mask[4, 0] == False  # noqa: E712
    got = np.asarray(remapped.ndarray)
    expected = x_np[np.clip(table, 0, n - 1)]
    valid = table != -1
    np.testing.assert_allclose(got[valid], expected[valid])


def test_hybrid_nabla_end_to_end(rng):
    """A perturbed periodic mesh through a real field-operator reduction:
    neighbor_sum over a mostly-structured V2E matches the numpy oracle."""
    from gt4py_tpu.next import neighbor_sum

    nv = 96
    v2e = (np.arange(nv)[:, None] + np.array([[0, 1, 2, 3]])) % nv
    bad = rng.choice(nv, size=4, replace=False)
    v2e[bad, 2] = rng.integers(0, nv, size=4)
    conn = gtx.as_connectivity([V, V2EDim], E, v2e)
    V2E = gtx.FieldOffset("V2E", source=E, target=(V, V2EDim))

    @gtx.field_operator
    def sum_edges(ef):
        return neighbor_sum(ef(V2E), axis=V2EDim)

    ef_np = rng.random(nv).astype(np.float32)
    out = gtx.zeros(gtx.domain({V: nv}), dtype=np.float32)
    sum_edges(gtx.as_field([E], ef_np), out=out, offset_provider={"V2E": conn})
    np.testing.assert_allclose(
        np.asarray(out.ndarray), ef_np[v2e].sum(axis=1), rtol=1e-6
    )


def test_multidim_field_rolls_whole_rows(rng):
    """ICON-style (V, K) fields ride the roll path too: rolls/selects/
    fix-ups act on whole rows, keeping trailing data axes streaming."""
    K = Dimension("K")
    n, nk = 64, 5
    table = periodic_ring(n)
    bad = rng.choice(n, size=3, replace=False)
    table[bad, 1] = rng.integers(0, n, size=3)
    conn = gtx.as_connectivity([V, V2EDim], V, table)
    assert _shift_plan(conn, 1, 0, n).res_rows is not None
    x_np = rng.random((n, nk)).astype(np.float32)
    f = gtx.as_field([V, K], x_np)

    # single column
    got1 = f._remap_connectivity(conn, column=1)
    np.testing.assert_allclose(np.asarray(got1.ndarray), x_np[table[:, 1]])
    # full table: neighbor axis right after source -> (V, V2E, K)
    got = f._remap_connectivity(conn)
    assert got.ndarray.shape == (n, table.shape[1], nk)
    np.testing.assert_allclose(np.asarray(got.ndarray), x_np[table])


def test_remap_full_table_uses_plan(rng):
    """Full-table remap (neighbor_sum source) goes through the per-column
    plans and matches the numpy oracle."""
    n = 36
    table = periodic_ring(n, deg=4)
    conn = gtx.as_connectivity([V, V2EDim], V, table)
    x_np = rng.random(n)
    f = gtx.as_field([V], x_np)
    remapped = f._remap_connectivity(conn)
    np.testing.assert_allclose(np.asarray(remapped.ndarray), x_np[table])
    assert all(
        _shift_plan(conn, c, 0, n) is not None for c in range(table.shape[1])
    )
