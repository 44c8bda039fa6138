from gt4py_tpu.cartesian.passes.pipeline import AnalyzedStencil, analyze  # noqa: F401
