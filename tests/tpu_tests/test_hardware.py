"""Hardware test tier: Pallas strategies vs the XLA backend on a REAL TPU.

Run with the platform pin lifted (the default conftest pins CPU):

    GT4PY_TEST_PLATFORM=tpu python -m pytest tests/tpu_tests -m tpu -q

This is the pytest-marker form of the reference's per-backend hardware
matrices (reference tests/next_tests/definitions.py:124-208, ADR 0015);
``run_on_tpu.py`` remains as a standalone wrapper.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU attached (set GT4PY_TEST_PLATFORM=tpu to lift the CPU pin)")
    return jax.devices()[0]


def test_hdiff_plane_matches_xla(tpu):
    from tests.tpu_tests import run_on_tpu

    run_on_tpu.check_hdiff_plane()


def test_tridiag_staged_matches_xla(tpu):
    from tests.tpu_tests import run_on_tpu

    run_on_tpu.check_tridiag_staged()


#: Strategies that mean "a Pallas kernel served the call" (everything the
#: backend can report except the "xla" fallback — pallas_backend.py:46-48).
#: The strategy *race* picks whichever kernel wins at the given shape, so
#: tests assert membership here, never a specific winner (round-4 lesson:
#: perf work legitimately flips race winners).
NATIVE_STRATEGIES = {"split", "plane", "staged", "tiled"}


def test_flagships_serve_native_strategies_on_hardware(tpu):
    """On real TPU (Mosaic compiles, probes run) the flagship classes must
    be served by a kernel strategy — not the XLA fallback. Which native
    strategy wins the race is an empirical performance decision, so only
    native-set membership is asserted (reference analog:
    tests/cartesian_tests/definitions.py expects_native_kernel)."""
    from gt4py_tpu import storage
    from gt4py_tpu.cartesian import gtscript
    from gt4py_tpu.cartesian.gtscript import FORWARD, PARALLEL, computation, interval

    F = gtscript.Field[np.float32]
    rng = np.random.default_rng(0)

    def smooth(inp: F, out: F):
        with computation(PARALLEL), interval(...):
            out = 0.25 * (inp[1, 0, 0] + inp[-1, 0, 0] + inp[0, 1, 0] + inp[0, -1, 0])

    st = gtscript.stencil(
        backend="tpu:pallas", definition=smooth, literal_float_precision=32
    )
    shape = (132, 132, 16)
    a = storage.from_array(rng.random(shape, dtype=np.float32), backend="tpu:pallas")
    b = storage.zeros(shape, dtype=np.float32, backend="tpu:pallas")
    exec_info = {}
    st(a, b, origin=(2, 2, 0), domain=(128, 128, 16), exec_info=exec_info)
    assert exec_info["pallas_strategy"] in NATIVE_STRATEGIES

    def cumsum(inp: F, out: F):
        with computation(FORWARD):
            with interval(0, 1):
                out = inp
            with interval(1, None):
                out = out[0, 0, -1] + inp

    st2 = gtscript.stencil(
        backend="tpu:pallas", definition=cumsum, literal_float_precision=32
    )
    c = storage.from_array(rng.random(shape, dtype=np.float32), backend="tpu:pallas")
    d = storage.zeros(shape, dtype=np.float32, backend="tpu:pallas")
    exec_info = {}
    st2(c, d, exec_info=exec_info)
    assert exec_info["pallas_strategy"] in NATIVE_STRATEGIES
    np.testing.assert_allclose(
        np.asarray(d), np.cumsum(np.asarray(c), axis=2), rtol=2e-5
    )


def test_pure_2d_plane_on_hardware(tpu):
    """All-IJ (nk == 1) stencils serve from the plane kernel on real
    Mosaic (round-2 degenerate-axis write guard)."""
    from gt4py_tpu import storage
    from gt4py_tpu.cartesian import gtscript
    from gt4py_tpu.cartesian.gtscript import PARALLEL, computation, interval

    F2 = gtscript.Field[gtscript.IJ, np.float32]

    def lap2d(src: F2, dst: F2):
        with computation(PARALLEL), interval(...):
            dst = src[1, 0] + src[-1, 0] + src[0, 1] + src[0, -1] - 4.0 * src

    st = gtscript.stencil(
        backend="tpu:pallas", definition=lap2d, literal_float_precision=32
    )
    rng = np.random.default_rng(7)
    src_np = rng.random((130, 130), dtype=np.float32)
    a = storage.from_array(src_np, backend="tpu:pallas", aligned_index=(1, 1))
    b = storage.zeros((130, 130), np.float32, backend="tpu:pallas", aligned_index=(1, 1))
    exec_info = {}
    st(a, b, domain=(128, 128, 1), exec_info=exec_info)
    assert exec_info["pallas_strategy"] == "plane"
    expected = (
        src_np[2:, 1:-1] + src_np[:-2, 1:-1] + src_np[1:-1, 2:]
        + src_np[1:-1, :-2] - 4.0 * src_np[1:-1, 1:-1]
    )
    np.testing.assert_allclose(np.asarray(b)[1:129, 1:129], expected, rtol=2e-6)
