"""Mesh renumbering utilities: spatial numbering recovers the
structured-connectivity fast path on scrambled grid meshes; Renumbering
relabels tables + data consistently (results invariant up to the
permutation)."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import (
    Dimension,
    DimensionKind,
    FieldOffset,
    Renumbering,
    neighbor_sum,
    shift_structure_report,
    spatial_renumbering,
)

V = Dimension("V")
E = Dimension("E")
V2VDim = Dimension("V2V", kind=DimensionKind.LOCAL)


def quad_mesh_v2v(m):
    """Periodic m*m quad mesh, row-major numbering: 4-neighborhood."""
    n = m * m
    idx = np.arange(n)
    x, y = idx % m, idx // m
    nb = [
        (y * m + (x + 1) % m),
        (y * m + (x - 1) % m),
        (((y + 1) % m) * m + x),
        (((y - 1) % m) * m + x),
    ]
    table = np.stack(nb, axis=1)
    coords = np.stack([y, x], axis=1)
    return table, coords


def test_row_major_mesh_engages():
    table, _ = quad_mesh_v2v(16)
    conn = gtx.as_connectivity([V, V2VDim], V, table)
    rep = shift_structure_report(conn, 16 * 16)
    assert all(r["engaged"] for r in rep)
    assert all(r["n_classes"] <= 3 for r in rep)
    assert all(r["residual_frac"] == 0.0 for r in rep)


def test_scrambled_mesh_recovered_by_spatial_renumbering():
    m = 16
    n = m * m
    table, coords = quad_mesh_v2v(m)
    rng = np.random.default_rng(17)
    scramble = rng.permutation(n)  # perm[old] = new
    ren0 = Renumbering(V, scramble)
    conn_scrambled = ren0.apply(gtx.as_connectivity([V, V2VDim], V, table))
    rep = shift_structure_report(conn_scrambled, n)
    assert not any(r["engaged"] for r in rep)  # gather path only

    # coordinates travel with the elements: coord of new id i is the old
    # coord of the element now numbered i
    coords_scrambled = ren0.permute_data(coords)
    perm = spatial_renumbering(coords_scrambled)
    ren1 = Renumbering(V, perm)
    conn_fixed = ren1.apply(conn_scrambled)
    rep_fixed = shift_structure_report(conn_fixed, n)
    assert all(r["engaged"] for r in rep_fixed)
    assert all(r["residual_frac"] == 0.0 for r in rep_fixed)


def test_tiled_renumbering_orders_by_tile():
    coords = np.array([[0, 0], [0, 5], [1, 0], [1, 5]])
    perm = spatial_renumbering(coords, tile=(2, 4))
    # tiles: (0,0),(0,1),(0,0),(0,1) -> tile-major: rows 0,2 first
    order = np.argsort(perm)
    assert order.tolist() == [0, 2, 1, 3]


def test_renumbering_validates_and_inverts():
    with pytest.raises(ValueError):
        Renumbering(V, np.array([0, 0, 1]))
    perm = np.array([2, 0, 1])
    r = Renumbering(V, perm)
    assert r.inverse.tolist() == [1, 2, 0]
    data = np.array([10.0, 20.0, 30.0])
    # element old-0 is now id 2: new data[2] == 10
    np.testing.assert_array_equal(r.permute_data(data), [20.0, 30.0, 10.0])


def test_skip_values_survive_relabeling():
    table = np.array([[1, -1], [0, -1]])
    conn = gtx.as_connectivity([V, V2VDim], V, table, skip_value=-1)
    r = Renumbering(V, np.array([1, 0]))
    out = r.apply(conn)
    t = np.asarray(out.table)
    assert (t[:, 1] == -1).all()
    # rows swapped AND indices relabeled: old row0=[1,-1] -> new row1=[0,-1]
    assert t[1, 0] == 0 and t[0, 0] == 1


def test_neighbor_sum_invariant_under_renumbering():
    """Renumbering is a pure relabelling: the field-operator result at
    element x is unchanged, just stored at its new position."""
    m = 8
    n = m * m
    table, coords = quad_mesh_v2v(m)
    rng = np.random.default_rng(23)
    scramble = rng.permutation(n)
    ren = Renumbering(V, scramble)
    V2V = FieldOffset("V2V", source=V, target=(V, V2VDim))

    @gtx.field_operator
    def nbsum(f):
        return neighbor_sum(f(V2V), axis=V2VDim)

    data = rng.random(n).astype(np.float32)

    conn_a = gtx.as_connectivity([V, V2VDim], V, table)
    out_a = gtx.zeros(gtx.domain({V: n}), dtype=np.float32)
    nbsum(gtx.as_field([V], data), out=out_a, offset_provider={"V2V": conn_a})

    conn_b = ren.apply(conn_a)
    out_b = gtx.zeros(gtx.domain({V: n}), dtype=np.float32)
    nbsum(
        gtx.as_field([V], ren.permute_data(data).copy()),
        out=out_b,
        offset_provider={"V2V": conn_b},
    )
    np.testing.assert_allclose(
        ren.permute_data(np.asarray(out_a.ndarray)),
        np.asarray(out_b.ndarray),
        rtol=1e-6,
    )
