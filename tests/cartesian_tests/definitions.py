"""Backend tiers and the test-exclusion matrix.

Counterpart of the reference's ``tests/cartesian_tests/definitions.py:34-54``
(backend lists derived from the live registry) and the exclusion-matrix
pattern of ``tests/next_tests/definitions.py:124-208`` (feature markers
mapped to per-backend skips, reference ADR 0015): tests declare the
features they exercise; whether a backend runs, xfails, or skips comes
from ONE central table instead of scattered ``skipif``s.
"""

from __future__ import annotations

import pytest

from gt4py_tpu.cartesian.backend.base import REGISTRY


ALL_BACKENDS = sorted(REGISTRY)
CPU_BACKENDS = [b for b in ALL_BACKENDS if not b.startswith("tpu:")]
TPU_BACKENDS = [b for b in ALL_BACKENDS if b.startswith("tpu:")]
# Reference: every backend except the pure-python oracles is "performance".
PERFORMANCE_BACKENDS = [b for b in ALL_BACKENDS if b not in ("debug", "numpy")]

# --- feature markers ---------------------------------------------------------

USES_SCAN = "uses_scan"
USES_WHILE = "uses_while"
USES_DATA_DIMS = "uses_data_dims"
USES_GLOBAL_TABLE = "uses_global_table"
USES_VARIABLE_K_OFFSET = "uses_variable_k_offset"
USES_ABSOLUTE_K = "uses_absolute_k"
USES_HORIZONTAL_REGION = "uses_horizontal_region"

SKIP = "skip"
XFAIL = "xfail"

#: backend -> {feature marker -> SKIP | XFAIL}. The Pallas backend
#: transparently falls back to the XLA path for features its kernel
#: generator does not cover, so nothing is excluded today; the matrix is
#: the mechanism future native-only backends hook into.
BACKEND_SKIP_TEST_MATRIX: dict[str, dict[str, str]] = {b: {} for b in ALL_BACKENDS}


def apply_exclusion(backend: str, *features: str) -> None:
    """Skip/xfail the current test according to the matrix."""
    table = BACKEND_SKIP_TEST_MATRIX.get(backend, {})
    for feature in features:
        action = table.get(feature)
        if action == SKIP:
            pytest.skip(f"{backend} does not support {feature}")
        if action == XFAIL:
            pytest.xfail(f"{backend} known-broken for {feature}")
