from gt4py_tpu.storage.interface import (  # noqa: F401
    empty,
    zeros,
    ones,
    full,
    from_array,
)
from gt4py_tpu.storage.storage import Storage  # noqa: F401
