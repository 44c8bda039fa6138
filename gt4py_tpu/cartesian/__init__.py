from gt4py_tpu.cartesian import gtscript  # noqa: F401
from gt4py_tpu.cartesian.stencil_object import FrozenStencil, StencilObject  # noqa: F401
