"""J-halo-split plane strategy tests (Pallas interpreter on CPU).

The split strategy activates for PARALLEL stencils with domain nj % 128 == 0
(tests use nj=128); every case is validated against the numpy backend, the
repo's standard oracle."""

import numpy as np
import pytest

from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.cartesian.gtscript import FORWARD, PARALLEL, computation, interval

from . import stencil_defs as defs

F = gtscript.Field[np.float64]


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def build(definition, **kwargs):
    return gtscript.stencil(
        backend="tpu:pallas", definition=definition, rebuild=True, **kwargs
    )


def compare(definition, arrays, *, domain, origin, scalars=None, externals=None):
    """Run tpu:pallas vs numpy on copies of the same inputs."""
    results = {}
    for backend in ("numpy", "tpu:pallas"):
        st = gtscript.stencil(
            backend=backend, definition=definition, rebuild=True,
            externals=externals or {},
        )
        copies = {n: a.copy() for n, a in arrays.items()}
        st(**copies, **(scalars or {}), origin=origin, domain=domain)
        results[backend] = copies
    for n in arrays:
        np.testing.assert_allclose(
            results["tpu:pallas"][n], results["numpy"][n], rtol=1e-12,
            err_msg=f"field {n}",
        )


def test_split_selected_for_lane_aligned_domain():
    """build_pallas_fn routes lane-aligned PARALLEL stencils to the split
    strategy (no silent detour through the standard plane path)."""
    from gt4py_tpu.cartesian.backend.pallas_codegen import build_pallas_fn

    st = gtscript.stencil(backend="jax", definition=defs.horizontal_diffusion,
                          rebuild=True)
    origins = {n: (2, 2, 0) for n in ("in_field", "out_field", "coeff")}
    fn = build_pallas_fn(st._analyzed, (20, 128, 4), origins, interpret=True)
    assert getattr(fn, "layout", None) == "split"
    fn2 = build_pallas_fn(st._analyzed, (20, 100, 4), origins, interpret=True)
    assert getattr(fn2, "layout", None) != "split"


def test_split_hdiff(rng):
    shape = (24, 132, 5)
    arrays = {
        "in_field": rng.random(shape),
        "out_field": np.zeros(shape),
        "coeff": rng.random(shape),
    }
    compare(defs.horizontal_diffusion, arrays, domain=(20, 128, 5), origin=(2, 2, 0))


def test_split_hdiff_vs_hand_oracle(rng):
    shape = (24, 132, 5)
    in_field = rng.random(shape)
    coeff = rng.random(shape)
    out_field = np.zeros(shape)
    st = build(defs.horizontal_diffusion)
    st(in_field, out_field, coeff, origin=(2, 2, 0), domain=(20, 128, 5))
    np.testing.assert_allclose(
        out_field[2:-2, 2:-2], defs.validate_horizontal_diffusion(in_field, coeff)
    )


def test_split_tight_out_per_field_origin(rng):
    """out allocated tight (no halo, no strip) while in carries the halo:
    exercises the partial-row-seed path and per-field origins."""
    def smooth(inp: F, out: F):
        with computation(PARALLEL), interval(...):
            out = 0.25 * (inp[1, 0, 0] + inp[-1, 0, 0] + inp[0, 1, 0] + inp[0, -1, 0])

    shape_in = (22, 130, 4)
    inp = np.random.default_rng(3).random(shape_in)
    out = np.zeros((20, 128, 4))
    st = build(smooth)
    st(inp, out, origin={"inp": (1, 1, 0), "out": (0, 0, 0)}, domain=(20, 128, 4))
    exp = 0.25 * (inp[2:, 1:-1] + inp[:-2, 1:-1] + inp[1:-1, 2:] + inp[1:-1, :-2])
    np.testing.assert_allclose(out, exp)


def test_split_masked_writes(rng):
    """Runtime if -> masked writes -> full-seed path."""
    shape = (8, 128, 3)
    arrays = {"field_a": rng.random(shape) - 0.5, "field_b": np.zeros(shape)}
    compare(defs.runtime_if, arrays, domain=shape, origin=(0, 0, 0))


def test_split_horizontal_region(rng):
    from .test_features import region_stencil

    shape = (9, 128, 2)
    arrays = {"a": np.zeros(shape)}
    compare(region_stencil, arrays, domain=shape, origin=(0, 0, 0))


def test_split_k_subinterval(rng):
    shape = (16, 128, 20)
    arrays = {"in_field": rng.random(shape), "out_field": np.zeros(shape)}
    compare(defs.large_k_interval, arrays, domain=shape, origin=(0, 0, 0))


def test_split_k_padding(rng):
    """nk=7 is not divisible by any ladder candidate: nkp > nk forces the
    full-seed path and K-row masking."""
    def scale(inp: F, out: F):
        with computation(PARALLEL), interval(...):
            out = 2.0 * inp

    shape = (8, 128, 7)
    inp = np.random.default_rng(5).random(shape)
    out = np.zeros(shape)
    build(scale)(inp, out)
    np.testing.assert_allclose(out, 2.0 * inp)


def test_split_write_then_ij_offset_read(rng):
    """API field written then read at I/J offsets in the same PARALLEL loop:
    the write has a J extent, so the field's STRIP is written too."""
    def wtr(inp: F, a: F, out: F):
        with computation(PARALLEL), interval(...):
            a = inp * 2.0
            out = a[0, 1, 0] + a[0, -1, 0] + a[1, 0, 0]

    shape = (22, 130, 4)
    arrays = {"inp": rng.random(shape), "a": np.zeros(shape), "out": np.zeros(shape)}
    compare(wtr, arrays, domain=(20, 128, 4), origin=(1, 1, 0))


def test_split_temporary_with_halo(rng):
    """Temporary read at J offsets: dual-value temp with halo part."""
    def lapdiff(inp: F, out: F):
        with computation(PARALLEL), interval(...):
            tmp = inp[0, 1, 0] - inp[0, -1, 0]
            out = tmp[0, 1, 0] - tmp[0, -1, 0] + tmp[1, 0, 0]

    shape = (24, 132, 4)
    arrays = {"inp": rng.random(shape), "out": np.zeros(shape)}
    compare(lapdiff, arrays, domain=(20, 128, 4), origin=(2, 2, 0))


def test_split_scalar_params_and_functions(rng):
    shape = (8, 128, 4)
    arrays = {"field_a": rng.random(shape), "field_b": rng.random(shape)}
    compare(defs.function_call, arrays, domain=shape, origin=(0, 0, 0))


def test_split_wide_strip_falls_back(rng):
    """An array much wider than the domain (strip > 64 cols) falls back at
    call time without error."""
    def copy(inp: F, out: F):
        with computation(PARALLEL), interval(...):
            out = inp

    shape = (8, 256, 3)
    inp = np.random.default_rng(7).random(shape)
    out = np.zeros(shape)
    st = build(copy)
    st(inp, out, origin=(0, 0, 0), domain=(8, 128, 3))
    np.testing.assert_allclose(out[:, :128], inp[:, :128])
    np.testing.assert_array_equal(out[:, 128:], 0.0)


def test_split_half_precision_computes_in_f32(rng, monkeypatch):
    """Half-precision (bfloat16) fields route through the split strategy
    with an f32 COMPUTE dtype: storage stays bf16, every loaded block
    upcasts once, stores downcast once. Output must match the numpy
    backend at half tolerance; the geometry must report half_compute."""
    from gt4py_tpu.cartesian.backend.pallas_codegen import build_pallas_fn
    from gt4py_tpu.core.definitions import bfloat16

    BF = gtscript.Field[bfloat16]

    def hdiff(in_field: BF, out_field: BF, coeff: BF):
        with computation(PARALLEL), interval(...):
            lap = 4.0 * in_field[0, 0, 0] - (
                in_field[1, 0, 0] + in_field[-1, 0, 0]
                + in_field[0, 1, 0] + in_field[0, -1, 0]
            )
            res = lap[1, 0, 0] - lap[0, 0, 0]
            flx = 0.0 if (res * (in_field[1, 0, 0] - in_field[0, 0, 0])) > 0 else res
            res = lap[0, 1, 0] - lap[0, 0, 0]
            fly = 0.0 if (res * (in_field[0, 1, 0] - in_field[0, 0, 0])) > 0 else res
            out_field = in_field[0, 0, 0] - coeff[0, 0, 0] * (
                flx[0, 0, 0] - flx[-1, 0, 0] + fly[0, 0, 0] - fly[0, -1, 0]
            )

    shape, domain, origin = (20, 134, 4), (16, 128, 4), (2, 3, 0)
    arrays = {
        "in_field": rng.random(shape).astype(bfloat16),
        "coeff": (rng.random(shape) * 0.1).astype(bfloat16),
        "out_field": np.zeros(shape, bfloat16),
    }

    # the lane-aligned bf16 stencil routes to split, with f32 compute
    st = gtscript.stencil(backend="jax", definition=hdiff, rebuild=True)
    origins = {n: origin for n in arrays}
    fn = build_pallas_fn(st._analyzed, domain, origins, interpret=True)
    assert getattr(fn, "layout", None) == "split"
    assert fn.geo.half_compute
    assert fn.geo.compute_dtypes["in_field"] == np.dtype(np.float32)
    assert fn.geo.dtypes["in_field"] == np.dtype(bfloat16)

    def run(backend):
        s = gtscript.stencil(backend=backend, definition=hdiff, rebuild=True)
        copies = {n: a.copy() for n, a in arrays.items()}
        s(**copies, origin=origin, domain=domain)
        return copies["out_field"].astype(np.float32)

    got, ref = run("tpu:pallas"), run("numpy")
    assert got.dtype == np.float32 and arrays["out_field"].dtype == np.dtype(bfloat16)
    np.testing.assert_allclose(got, ref, rtol=0.03, atol=0.03)

    # flag-off path: literal half compute is bit-compatible with numpy's
    monkeypatch.setenv("GT4PY_PALLAS_HALF_COMPUTE_F32", "0")
    fn_off = build_pallas_fn(st._analyzed, domain, origins, interpret=True)
    assert not fn_off.geo.half_compute
    got_off = run("tpu:pallas")
    np.testing.assert_allclose(got_off, ref, rtol=0.03, atol=0.03)


def test_split_native_layout_chain(rng):
    """Chained calls through Storage keep the (main, strip) pair in the
    native cache; lazy decode reassembles the public array exactly."""
    from gt4py_tpu import storage

    def smooth(inp: F, out: F):
        with computation(PARALLEL), interval(...):
            out = 0.5 * inp[0, 0, 0] + 0.125 * (
                inp[1, 0, 0] + inp[-1, 0, 0] + inp[0, 1, 0] + inp[0, -1, 0]
            )

    shape = (20, 132, 6)
    data = np.random.default_rng(9).random(shape)
    results = {}
    for backend in ("jax", "tpu:pallas"):
        st = gtscript.stencil(backend=backend, definition=smooth, name=f"ssm_{backend}")
        a = storage.from_array(data, backend=backend)
        b = storage.zeros(shape, backend=backend)
        for _ in range(2):
            st(a, b, origin=(1, 2, 0), domain=(18, 128, 6))
            st(b, a, origin=(1, 2, 0), domain=(18, 128, 6))
        results[backend] = (np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(results["tpu:pallas"][0], results["jax"][0], rtol=1e-13)
    np.testing.assert_allclose(results["tpu:pallas"][1], results["jax"][1], rtol=1e-13)
