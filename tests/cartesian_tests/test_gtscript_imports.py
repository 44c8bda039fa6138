"""Import-hook tests (reference: cartesian/gtscript_imports.py)."""

import os
import sys
import textwrap

import numpy as np

from gt4py_tpu.cartesian import gtscript_imports


def test_gt_py_import(tmp_path):
    src = textwrap.dedent(
        """
        Field3D = Field[np.float64]

        @stencil(backend="numpy")
        def plus_one(a: Field3D):
            with computation(PARALLEL), interval(...):
                a = a + 1.0
        """
    )
    (tmp_path / "my_stencils.gt.py").write_text(src)
    finder = gtscript_imports.enable([str(tmp_path)])
    try:
        import my_stencils  # noqa: F401

        a = np.zeros((2, 2, 2))
        my_stencils.plus_one(a)
        np.testing.assert_allclose(a, 1.0)
    finally:
        gtscript_imports.disable()
        sys.modules.pop("my_stencils", None)
