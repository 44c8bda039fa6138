"""GSPMD-sharded field-view fields on the 8-device CPU mesh: operators with
shifts run partitioned, XLA inserts the halo collectives."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next.common import Dimension, DimensionKind, FieldOffset
from gt4py_tpu.next.field_utils import asnumpy
from gt4py_tpu.parallel import CartesianMesh, shard_field

I = Dimension("I")
J = Dimension("J")
K = Dimension("K", kind=DimensionKind.VERTICAL)
Ioff = FieldOffset("Ioff", source=I, target=(I,))
Joff = FieldOffset("Joff", source=J, target=(J,))


@pytest.fixture
def mesh():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return CartesianMesh(jax.devices()[:8])


def test_sharded_laplacian_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    data = rng.random((64, 64, 4))
    phi = gtx.as_field({I: 64, J: 64, K: 4}, data)
    phi_sharded = shard_field(phi, mesh)

    @gtx.field_operator
    def lap(phi):
        return (
            -4.0 * phi
            + phi(Ioff[1]) + phi(Ioff[-1])
            + phi(Joff[1]) + phi(Joff[-1])
        )

    op = {"Ioff": I, "Joff": J}
    # The 5-point laplacian lives on the interior ranges (1, 63).
    out_ref = gtx.zeros({I: (1, 63), J: (1, 63), K: 4})
    lap(phi, out=out_ref, offset_provider=op)
    assert asnumpy(out_ref).shape == (62, 62, 4)
    expected = (
        -4.0 * data[1:-1, 1:-1]
        + data[2:, 1:-1] + data[:-2, 1:-1]
        + data[1:-1, 2:] + data[1:-1, :-2]
    )
    np.testing.assert_allclose(asnumpy(out_ref), expected, rtol=1e-12)

    out_sh = gtx.zeros({I: (1, 63), J: (1, 63), K: 4})
    lap(phi_sharded, out=out_sh, offset_provider=op)
    np.testing.assert_allclose(asnumpy(out_sh), expected, rtol=1e-12)


def test_sharding_placement(mesh):
    phi = gtx.as_field({I: 64, J: 64}, np.zeros((64, 64)))
    sh = shard_field(phi, mesh)
    sharding = sh.ndarray.sharding
    # I split over x (2), J over y (4): per-device shard is (32, 16)
    assert sharding.shard_shape((64, 64)) == (64 // mesh.nx, 64 // mesh.ny)


def test_sharded_scan(mesh):
    rng = np.random.default_rng(1)
    data = rng.random((16, 16, 8))
    inp = shard_field(gtx.as_field({I: 16, J: 16, K: 8}, data), mesh)

    @gtx.scan_operator(axis=K, forward=True, init=0.0)
    def cumsum(carry: float, x: float) -> float:
        return carry + x

    out = gtx.zeros({I: 16, J: 16, K: 8})
    cumsum(inp, out=out)
    np.testing.assert_allclose(asnumpy(out), np.cumsum(data, axis=2), rtol=1e-12)


def test_sharded_unstructured_nabla(mesh):
    """Unstructured gathers + neighbor reductions under GSPMD: shard the
    vertex dimension over the mesh; XLA partitions the gathers (inserting
    the needed collectives) and the result matches single-device."""
    import jax

    from gt4py_tpu.next import neighbor_sum
    from gt4py_tpu.next.embedded import offset_provider_context
    from gt4py_tpu.parallel.next_fields import field_sharding
    from tests.next_tests.test_field_ops import make_periodic_mesh

    V = Dimension("Vertex")
    E = Dimension("Edge")
    V2EDim = Dimension("V2E", kind=DimensionKind.LOCAL)
    E2VDim = Dimension("E2V", kind=DimensionKind.LOCAL)
    E2V = FieldOffset("E2V", source=V, target=(E, E2VDim))
    V2E = FieldOffset("V2E", source=E, target=(V, V2EDim))

    n = 16
    e2v_np, v2e_np, signs_np = make_periodic_mesh(n)
    nv = n * n
    rng = np.random.default_rng(4)
    pp_np = rng.random(nv)
    sx_np = rng.random(2 * nv)
    vol_np = rng.random(nv) + 0.5

    e2v = gtx.as_connectivity([E, E2VDim], V, e2v_np)
    v2e = gtx.as_connectivity([V, V2EDim], E, v2e_np)
    prov = {"E2V": e2v, "V2E": v2e}
    sign_f = gtx.as_field([V, V2EDim], signs_np)

    @gtx.field_operator
    def nabla_x(pp, s_x, sign, vol):
        zavg = 0.5 * (pp(E2V[0]) + pp(E2V[1])) * s_x
        return neighbor_sum(zavg(V2E) * sign, axis=V2EDim) / vol

    # single-device reference
    ref = gtx.zeros({V: nv})
    nabla_x(
        gtx.as_field([V], pp_np), gtx.as_field([E], sx_np), sign_f,
        gtx.as_field([V], vol_np), out=ref, offset_provider=prov,
    )

    # sharded: vertex-indexed operands over the 8-device mesh (flat axis
    # over 'x' only; 'y' replicated)
    sharding = field_sharding(mesh, (V,), {V: "x"})
    pp_sh = gtx.Field(
        gtx.domain({V: nv}), jax.device_put(np.asarray(pp_np), sharding)
    )
    vol_sh = gtx.Field(
        gtx.domain({V: nv}), jax.device_put(np.asarray(vol_np), sharding)
    )

    @jax.jit
    def step(pp, sx, vol):
        with offset_provider_context(prov):
            return nabla_x.definition(
                pp, gtx.as_field([E], sx), sign_f, vol
            ).ndarray

    out = step(pp_sh, sx_np, vol_sh)
    np.testing.assert_allclose(np.asarray(out), ref.asnumpy(), rtol=1e-12)


def test_sharded_whole_program(mesh):
    """A @gtx.program pipeline over GSPMD-sharded fields: the whole-program
    jit preserves shardings and matches single-device results."""
    rng = np.random.default_rng(9)
    data = rng.random((32, 32))

    @gtx.field_operator
    def lap(phi):
        return -4.0 * phi + phi(Ioff[1]) + phi(Ioff[-1]) + phi(Joff[1]) + phi(Joff[-1])

    @gtx.field_operator
    def relax(phi, l):
        return phi + 0.1 * l

    @gtx.program
    def smooth(phi, tmp, out):
        lap(phi, out=tmp)
        relax(phi, tmp, out=out, domain={I: (1, 31), J: (1, 31)})

    prov = {"Ioff": I, "Joff": J}

    # single-device reference
    phi_r = gtx.as_field([I, J], data)
    tmp_r = gtx.zeros({I: (1, 31), J: (1, 31)})
    out_r = gtx.zeros({I: 32, J: 32})
    smooth(phi_r, tmp_r, out_r, offset_provider=prov)

    # sharded (tmp is 30x30 — not mesh-divisible — so it stays
    # replicated; GSPMD handles the mixed layout)
    phi_s = shard_field(gtx.as_field([I, J], data), mesh)
    tmp_s = gtx.zeros({I: (1, 31), J: (1, 31)})
    out_s = shard_field(gtx.zeros({I: 32, J: 32}), mesh)
    smooth(phi_s, tmp_s, out_s, offset_provider=prov)

    np.testing.assert_allclose(asnumpy(out_s), asnumpy(out_r), rtol=1e-12)


def test_sharded_staggered_cgrid(mesh):
    """Staggered premaps (pure domain relabels) under GSPMD: the C-grid
    face->center average matches single-device when u is sharded."""
    from gt4py_tpu.next import flip_staggered

    IHalf = flip_staggered(I)

    @gtx.field_operator
    def to_centers(u):
        return 0.5 * (u(I + 0.5) + u(I - 0.5))

    rng = np.random.default_rng(17)
    n = 64
    u_np = rng.random(n + 1)

    ref = gtx.zeros({I: (0, n)})
    to_centers(gtx.as_field([IHalf], u_np), out=ref, offset_provider={})

    # shard u's (n+1)-sized staggered axis: 65 not divisible by the mesh,
    # so shard the OUT field instead and leave u replicated — mixed
    # layouts are the realistic case for staggered boundaries.
    from gt4py_tpu.parallel.next_fields import field_sharding
    import jax

    out_sharding = field_sharding(mesh, (I,), {I: "x"})
    out = gtx.Field(
        gtx.domain({I: (0, n)}),
        jax.device_put(np.zeros(n), out_sharding),
    )
    to_centers(gtx.as_field([IHalf], u_np), out=out, offset_provider={})
    np.testing.assert_allclose(asnumpy(out), asnumpy(ref))


def test_sharded_scan_operator(mesh):
    """A K scan over an IJ-sharded field: lax.scan runs per-shard (K is
    unsharded), no cross-device traffic needed."""
    import jax

    rng = np.random.default_rng(4)
    data = rng.random((16, 16, 6))
    f = shard_field(gtx.as_field({I: 16, J: 16, K: 6}, data), mesh).ndarray

    @gtx.scan_operator(axis=K, forward=True, init=0.0)
    def kcum(carry: float, x: float) -> float:
        return carry + x

    @jax.jit
    def step(arr):
        field = gtx.as_field({I: 16, J: 16, K: 6}, arr)
        return kcum(field).ndarray

    res = np.asarray(step(f))
    np.testing.assert_allclose(res, np.cumsum(data, axis=2), rtol=1e-12)


def test_sharded_scan_composition(mesh):
    """Field-operator + scan composition (tridiagonal solve) on sharded
    inputs through the embedded path under jit."""
    import jax

    rng = np.random.default_rng(5)
    shape = (16, 16, 6)
    b = np.full(shape, 4.0)
    a = -np.ones(shape)
    c = -np.ones(shape)
    d = rng.random(shape)

    @gtx.scan_operator(axis=K, forward=True, init=(0.0, 0.0))
    def fwd(carry, a: float, b: float, c: float, d: float):
        cp_prev, dp_prev = carry
        denom = b - a * cp_prev
        return (c / denom, (d - a * dp_prev) / denom)

    @gtx.scan_operator(axis=K, forward=False, init=0.0)
    def bwd(x_kp1, cp: float, dp: float):
        return dp - cp * x_kp1

    @jax.jit
    def solve(aa, bb, cc, dd):
        fa = gtx.as_field({I: 16, J: 16, K: 6}, aa)
        fb = gtx.as_field({I: 16, J: 16, K: 6}, bb)
        fc = gtx.as_field({I: 16, J: 16, K: 6}, cc)
        fd = gtx.as_field({I: 16, J: 16, K: 6}, dd)
        cp, dp = fwd(fa, fb, fc, fd)
        return bwd(cp, dp).ndarray

    args = [
        shard_field(gtx.as_field({I: 16, J: 16, K: 6}, x), mesh).ndarray
        for x in (a, b, c, d)
    ]
    got = np.asarray(solve(*args))

    from tests.cartesian_tests import stencil_defs as defs

    expected = defs.validate_tridiagonal_solver(a, b, c, d)
    np.testing.assert_allclose(got, expected, rtol=1e-10)
