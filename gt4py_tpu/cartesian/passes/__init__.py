from gt4py_tpu.cartesian.passes.pipeline import (  # noqa: F401
    AnalyzedStencil,
    PassPipeline,
    analyze,
)
