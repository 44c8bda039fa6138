"""User-controllable pass pipeline (reference DefaultPipeline contract,
gtc/passes/oir_pipeline.py:55-90: ordered steps, skipping, add-steps,
hashable identity used in build caching)."""

import numpy as np
import pytest

from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.cartesian.gtscript import FORWARD, PARALLEL, computation, interval
from gt4py_tpu.cartesian.passes import PassPipeline

F = gtscript.Field[np.float64]


def coeff_scan(inp: F, out: F):
    # a PARALLEL coefficient temp feeding a FORWARD loop (seq_fusion target)
    # plus an inlinable temporary (inline_temporaries target)
    with computation(PARALLEL), interval(...):
        c = inp * 2.0
        d = c + 1.0
    with computation(FORWARD):
        with interval(0, 1):
            out = d
        with interval(1, None):
            out = out[0, 0, -1] + d


def run(backend="numpy", **opts):
    st = gtscript.stencil(backend=backend, definition=coeff_scan, rebuild=True, **opts)
    rng = np.random.default_rng(3)
    inp = rng.random((5, 6, 7))
    out = np.zeros_like(inp)
    st(inp, out, origin=(0, 0, 0), domain=(5, 6, 7))
    return out


def test_default_step_names_and_order():
    names = [n for n, _ in PassPipeline().steps]
    assert names == [
        "definitive_assignment",
        "lower_control_flow",
        "vector_unroll",
        "race_detection",
        "power_unroll",
        "infer_dtypes",
        "seq_fusion",
        "inline_temporaries",
    ]


def test_skip_unknown_step_raises():
    with pytest.raises(ValueError, match="Unknown pipeline step"):
        PassPipeline(skip=("no_such_pass",))


def test_add_steps_must_be_callable():
    with pytest.raises(ValueError, match="callable"):
        PassPipeline(add_steps=("not-a-function",))


@pytest.mark.parametrize(
    "skip",
    [(), ("seq_fusion",), ("inline_temporaries",), ("seq_fusion", "inline_temporaries")],
)
def test_skipping_optimizations_preserves_semantics(skip):
    """seq_fusion and inline_temporaries only rearrange work; every skip
    combination computes the identical result."""
    base = run()
    got = run(pass_pipeline=PassPipeline(skip=skip))
    np.testing.assert_array_equal(got, base)


def test_add_steps_runs_custom_pass():
    """A user pass appended via add_steps executes on the lowered stencil
    (after the built-in steps) and its rewrite is visible in the result."""
    seen = []

    def negate_literals(stencil):
        # structural probe + rewrite: flip the sign of every float literal
        from gt4py_tpu import eve
        from gt4py_tpu.cartesian import gtir

        seen.append(stencil.name)

        class Negate(eve.NodeTranslator):
            def visit_Literal(self, node):
                if "float" in str(node.dtype or ""):
                    return gtir.Literal(value=str(-float(node.value)), dtype=node.dtype)
                return node

        return Negate().visit(stencil)

    def scale(inp: F, out: F):
        with computation(PARALLEL), interval(...):
            out = inp * 3.0

    st = gtscript.stencil(
        backend="numpy", definition=scale, rebuild=True,
        pass_pipeline=PassPipeline(add_steps=(negate_literals,)),
    )
    inp = np.ones((4, 4, 2))
    out = np.zeros_like(inp)
    st(inp, out, origin=(0, 0, 0), domain=(4, 4, 2))
    assert seen  # the pass ran
    np.testing.assert_array_equal(out, -3.0 * inp)


def test_skipping_race_detection_admits_racy_stencil():
    """Checks are steps too (the reference lets any pass be skipped): with
    race_detection skipped, an offset-read-after-write PARALLEL stencil
    builds; by default it is rejected."""

    def racy(a: F, b: F):
        with computation(PARALLEL), interval(...):
            a = a[1, 0, 0] + 1.0
            b = a[-1, 0, 0]

    from gt4py_tpu.cartesian.frontend import GTScriptSyntaxError

    with pytest.raises(Exception):
        gtscript.stencil(backend="numpy", definition=racy, rebuild=True)

    st = gtscript.stencil(
        backend="numpy", definition=racy, rebuild=True,
        pass_pipeline=PassPipeline(skip=("race_detection",)),
    )
    assert st is not None


def test_pipeline_identity_is_cache_key():
    """PassPipeline is hashable/reprable with a deterministic identity
    (used in the stencil fingerprint — caching.py parts list)."""
    a = PassPipeline(skip=("seq_fusion",))
    b = PassPipeline(skip=("seq_fusion",))
    assert a == b and hash(a) == hash(b)
    assert repr(a) == repr(b)
    assert "seq_fusion" not in repr(a)
    assert {a: 1}[b] == 1

    def custom(s):
        return s

    c = PassPipeline(add_steps=(custom,))
    assert "custom" in repr(c)


def test_distinct_pipelines_fingerprint_differently():
    from gt4py_tpu.cartesian.caching import stencil_fingerprint

    def f(a: F):
        with computation(PARALLEL), interval(...):
            a = a + 1.0

    base = dict(backend="numpy", externals={}, dtypes={})
    fp1 = stencil_fingerprint(f, {**base, "backend_opts": {}})
    fp2 = stencil_fingerprint(
        f, {**base, "backend_opts": {"pass_pipeline": PassPipeline(skip=("seq_fusion",))}}
    )
    assert fp1 != fp2
