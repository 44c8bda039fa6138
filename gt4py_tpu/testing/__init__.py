"""Testing kit: hypothesis-driven stencil test suites and input strategies.

Counterpart of the reference's ``gt4py.cartesian.testing``
(/root/reference/src/gt4py/cartesian/testing/suites.py:53,
input_strategies.py:47): declarative stencil test-suite classes that run a
definition on every registered backend against a NumPy validation oracle
with hypothesis-generated fields.
"""

from gt4py_tpu.testing.input_strategies import (  # noqa: F401
    field,
    global_boundaries,
    parameter,
)
from gt4py_tpu.testing.suites import StencilTestSuite  # noqa: F401
