"""Explicit-ghost-row distributed unstructured gathers (SURVEY.md §2.6:
"connectivity tables become sharded gather indices").

Validates, on the 8-device virtual CPU mesh:
- the partition plan (local tables + uniform halo slabs) reproduces the
  dense gather exactly,
- the shard_map FVM-nabla reduction matches the single-device oracle,
- the lowered HLO exchanges halos via collective-permute and contains NO
  all-gather of the value array (the point of explicit ghosts vs GSPMD).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gt4py_tpu.parallel.unstructured import (
    ShardedGather,
    halo_gather,
    partition_gather,
    ring_partition,
)


def ring_table(n, offsets):
    return (np.arange(n)[:, None] + np.asarray(offsets)[None, :]) % n


@pytest.fixture
def mesh1d():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(devs[:8]), axis_names=("x",))


def test_ring_partition():
    assert list(ring_partition(64, 8)) == [0, 8, 16, 24, 32, 40, 48, 56, 64]
    with pytest.raises(ValueError):
        ring_partition(65, 8)


def test_plan_dense_equivalence():
    """Serial check: reassembling [lo|owned|hi] per shard and gathering
    through the local tables equals values[table]."""
    n = 64
    table = ring_table(n, [-2, 0, 1, 3])
    vals = np.random.default_rng(0).random(n)
    P_ = 8
    plan = partition_gather(table, n, P_)
    assert plan.halo_lo >= 2 and plan.halo_hi >= 3
    vst = ring_partition(n, P_)
    out = np.zeros_like(vals[table])
    for p in range(P_):
        lo, hi = vst[p], vst[p + 1]
        ext = np.concatenate([
            vals[(np.arange(lo - plan.halo_lo, lo)) % n],
            vals[lo:hi],
            vals[(np.arange(hi, hi + plan.halo_hi)) % n],
        ])
        rows = slice(lo, hi)  # rows partition == values partition here
        out[rows] = ext[plan.local_tables[rows]]
    np.testing.assert_allclose(out, vals[table])


def test_plan_rejects_far_ghosts():
    n = 64
    table = ring_table(n, [0, 1])
    table[5, 1] = 40  # reaches shard 5 from shard 0: not a ring neighbor
    with pytest.raises(ValueError, match="renumber"):
        partition_gather(table, n, 8)


def test_shard_map_gather_matches_oracle(mesh1d):
    n = 64
    table = ring_table(n, [-1, 0, 2])
    vals = np.random.default_rng(1).random(n).astype(np.float32)
    plan = partition_gather(table, n, 8)
    lt = jnp.asarray(plan.local_tables)
    v = jnp.asarray(vals)

    @jax.jit
    def run(v, lt):
        f = shard_map(
            lambda vv, tt: halo_gather(vv, tt, plan, "x"),
            mesh=mesh1d,
            in_specs=(P("x"), P("x", None)),
            out_specs=P("x", None),
        )
        return f(v, lt)

    got = run(v, lt)
    np.testing.assert_allclose(np.asarray(got), vals[table], rtol=1e-6)
    # HLO: halos ride collective-permute; the values are NEVER all-gathered
    hlo = run.lower(v, lt).compile().as_text()
    assert "collective-permute" in hlo
    assert "all-gather" not in hlo


def test_sharded_fvm_nabla_reduction(mesh1d):
    """Sharded neighbor_sum-style reduction: gather edge values through
    V2E with explicit ghosts, multiply by signs, reduce — vs the dense
    oracle."""
    rng = np.random.default_rng(2)
    n = 64  # vertices == edges on a ring
    v2e = ring_table(n, [-2, -1, 0, 1])
    signs = np.where(np.arange(4) % 2 == 0, 1.0, -1.0).astype(np.float32)
    edge_vals = rng.random(n).astype(np.float32)
    plan = partition_gather(v2e, n, 8)
    lt = jnp.asarray(plan.local_tables)

    @jax.jit
    def nabla(ev, lt):
        def local(evv, tt):
            g = halo_gather(evv, tt, plan, "x")
            return (g * signs).sum(axis=1)

        return shard_map(
            local, mesh=mesh1d, in_specs=(P("x"), P("x", None)),
            out_specs=P("x"),
        )(ev, lt)

    got = nabla(jnp.asarray(edge_vals), lt)
    want = (edge_vals[v2e] * signs).sum(axis=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)
    hlo = nabla.lower(jnp.asarray(edge_vals), lt).compile().as_text()
    assert "collective-permute" in hlo and "all-gather" not in hlo


def test_renumbering_composition():
    """An id-scrambled ring becomes partitionable after
    mesh_utils.spatial_renumbering — the intended workflow."""
    from gt4py_tpu.next.mesh_utils import spatial_renumbering

    n = 64
    rng = np.random.default_rng(3)
    # a ring laid out with scrambled ids: coords say where each id lives
    scramble = rng.permutation(n)  # position -> old id
    coords = np.empty(n)
    coords[scramble] = np.arange(n)  # old id -> ring position
    table_old = np.empty((n, 2), dtype=np.int64)
    for pos in range(n):
        table_old[scramble[pos]] = [
            scramble[pos], scramble[(pos + 1) % n]
        ]
    with pytest.raises(ValueError):
        partition_gather(table_old, n, 8)
    perm = spatial_renumbering(coords)  # perm[old] = new
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    table_new = perm[table_old][inv]  # relabel values, reorder rows
    plan = partition_gather(table_new, n, 8)
    assert plan.halo_lo <= 1 and plan.halo_hi <= 1
