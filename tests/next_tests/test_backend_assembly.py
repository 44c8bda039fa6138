"""Backend assembly tests (reference next/backend.py Transforms
MultiWorkflow + otf/workflow.py NamedStepSequence/MultiWorkflow +
otf/stages.py typed artifacts): backends are objects carrying a
user-replaceable transforms pipeline; every toolchain phase produces a
typed, fingerprinted stage artifact."""

import dataclasses

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import (
    Backend,
    Dimension,
    MultiWorkflow,
    NamedStepSequence,
    Transforms,
    resolve_backend,
    stages,
)

I = Dimension("I")


@gtx.field_operator
def _dbl(a):
    return a * 2.0


def _field(n=8):
    return gtx.as_field([I], np.arange(float(n)))


# --- NamedStepSequence / MultiWorkflow ---------------------------------------


def test_named_step_sequence_runs_in_field_order():
    @dataclasses.dataclass(frozen=True)
    class Seq(NamedStepSequence):
        one: object = staticmethod(lambda x: x + ["one"])
        two: object = staticmethod(lambda x: x + ["two"])

    assert Seq()([]) == ["one", "two"]


def test_named_step_sequence_replace_swaps_a_step():
    @dataclasses.dataclass(frozen=True)
    class Seq(NamedStepSequence):
        one: object = staticmethod(lambda x: x + ["one"])
        two: object = staticmethod(lambda x: x + ["two"])

    swapped = Seq().replace(two=lambda x: x + ["TWO"])
    assert swapped([]) == ["one", "TWO"]


def test_named_step_sequence_skips_none_steps():
    @dataclasses.dataclass(frozen=True)
    class Seq(NamedStepSequence):
        one: object = staticmethod(lambda x: x + ["one"])
        two: object = None

    assert Seq()([]) == ["one"]


def test_multi_workflow_per_input_order():
    @dataclasses.dataclass(frozen=True)
    class Mw(MultiWorkflow):
        fwd: object = staticmethod(lambda x: x + ["fwd"])
        bwd: object = staticmethod(lambda x: x + ["bwd"])

        def step_order(self, inp):
            return ["bwd", "fwd"] if inp and inp[0] == "reverse" else ["fwd", "bwd"]

    assert Mw()([]) == ["fwd", "bwd"]
    assert Mw()(["reverse"]) == ["reverse", "bwd", "fwd"]


# --- registry / resolution ----------------------------------------------------


def test_registry_resolution():
    be = resolve_backend("jax")
    assert isinstance(be, Backend) and be.kind == "jax"
    assert resolve_backend(be) is be
    assert resolve_backend(None) is None
    with pytest.raises(ValueError, match="Unknown backend"):
        resolve_backend("no-such-backend")


def test_backend_object_on_operator():
    be = resolve_backend("jax")
    out = gtx.zeros({I: 8})
    _dbl.with_backend(be)(_field(), out=out)
    np.testing.assert_allclose(out.asnumpy(), 2 * np.arange(8.0))


# --- the jax:aot chain --------------------------------------------------------


def test_aot_backend_executes():
    out = gtx.zeros({I: 8})
    _dbl.with_backend("jax:aot")(_field(), out=out)
    np.testing.assert_allclose(out.asnumpy(), 2 * np.arange(8.0))


def test_aot_dynamic_kwargs_not_baked():
    @gtx.field_operator(backend="jax:aot")
    def scaled(a, s):
        return a * s

    out = gtx.zeros({I: 8})
    scaled(_field(), s=3.0, out=out)
    np.testing.assert_allclose(out.asnumpy(), 3 * np.arange(8.0))
    scaled(_field(), s=5.0, out=out)
    np.testing.assert_allclose(out.asnumpy(), 5 * np.arange(8.0))


def test_compile_job_exposes_all_stages():
    be = resolve_backend("jax:aot")
    job = be.compile_job(lambda a: a + 1.0, np.arange(4.0))
    assert isinstance(job.typed_stage, stages.TypedDefinition)
    assert isinstance(job.traced_stage, stages.TracedProgram)
    assert isinstance(job.lowered_stage, stages.LoweredProgram)
    assert isinstance(job.compiled_stage, stages.CompiledProgram)
    assert "add" in job.traced_stage.text
    assert job.traced_stage.fingerprint != job.lowered_stage.fingerprint
    np.testing.assert_allclose(
        np.asarray(job.executable(np.arange(4.0))), np.arange(4.0) + 1.0
    )


def test_stage_fingerprints_stable_and_distinct():
    d1 = stages.OperatorDefinition(_dbl.definition)
    d2 = stages.OperatorDefinition(_dbl.definition)
    assert d1.fingerprint == d2.fingerprint
    d3 = stages.OperatorDefinition(_dbl.definition, static_args=(("s", 2),))
    assert d3.fingerprint != d1.fingerprint


# --- user-controllable transform pipeline ------------------------------------


def test_custom_rewrite_step_is_applied():
    calls = []

    def spy(fn):
        def wrapped(*a, **k):
            calls.append(1)
            return fn(*a, **k)

        return wrapped

    base = resolve_backend("jax")
    custom = base.replace(
        name="jax:spy", transforms=base.transforms.with_rewrites(spy)
    )
    out = gtx.zeros({I: 8})
    _dbl.with_backend(custom)(_field(), out=out)
    np.testing.assert_allclose(out.asnumpy(), 2 * np.arange(8.0))
    assert calls, "rewrite step did not run"


def test_remat_rewrite_composes():
    import jax

    base = resolve_backend("jax")
    remat = base.replace(
        name="jax:remat", transforms=base.transforms.with_rewrites(jax.checkpoint)
    )
    out = gtx.zeros({I: 8})
    _dbl.with_backend(remat)(_field(), out=out)
    np.testing.assert_allclose(out.asnumpy(), 2 * np.arange(8.0))


def test_replaced_compile_step_controls_executable():
    base = resolve_backend("jax")
    seen = {}

    def eager_compile(job):
        seen["fn"] = job.fn
        job.executable = job.fn  # no jit at all
        return job

    custom = base.replace(
        name="jax:eagercompile",
        transforms=base.transforms.replace(compile=eager_compile),
    )
    out = gtx.zeros({I: 8})
    _dbl.with_backend(custom)(_field(), out=out)
    np.testing.assert_allclose(out.asnumpy(), 2 * np.arange(8.0))
    # The compile step receives the FOAST-compiled form of the definition
    # (the raw definition when the operator is outside the FOAST subset).
    assert getattr(seen["fn"], "__gt_foast__", False) or seen["fn"] is _dbl.definition
