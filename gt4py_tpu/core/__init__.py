from gt4py_tpu.core.definitions import (  # noqa: F401
    DeviceType,
    DType,
    LITERAL_FLOAT_PRECISION,
    LITERAL_INT_PRECISION,
)
