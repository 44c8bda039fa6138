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
# Native-KERNEL path markers (round-3 hardware deltas): the construct runs
# correctly on `tpu:pallas` but is SERVED by the XLA fallback, not a
# Mosaic kernel. Tests asserting `pallas_strategy != "xla"` declare them.
USES_FLOAT64 = "uses_float64"
USES_LARGE_GLOBAL_TABLE = "uses_large_global_table"  # > _MAX_TABLE_ONEHOT
USES_MATMUL = "uses_matmul"  # '@' on data-dim fields
USES_WHOLE_VECTOR_OPS = "uses_whole_vector_ops"  # unindexed data-dim reads

SKIP = "skip"
XFAIL = "xfail"
#: the construct executes CORRECTLY but through the XLA fallback — tests
#: asserting native-kernel service must not require it
XLA_FALLBACK = "xla_fallback"

#: backend -> {feature marker -> SKIP | XFAIL | XLA_FALLBACK}. Results are
#: always correct on every backend (the Pallas backend falls back to the
#: XLA path transparently); entries here are the honest record of which
#: constructs the KERNEL generators do not serve natively on hardware —
#: measured by tests/tpu_tests/test_registry_hardware.py (reference
#: pattern: tests/next_tests/definitions.py:124-208, ADR 0015).
BACKEND_SKIP_TEST_MATRIX: dict[str, dict[str, str]] = {b: {} for b in ALL_BACKENDS}
BACKEND_SKIP_TEST_MATRIX["tpu:pallas"] = {
    # Mosaic has no 64-bit types (pallas_codegen._check_supported).
    USES_FLOAT64: XLA_FALLBACK,
    # dynamic lookups one-hot-select over the table; capped at
    # _MAX_TABLE_ONEHOT entries (pallas_codegen.py).
    USES_LARGE_GLOBAL_TABLE: XLA_FALLBACK,
    # ('@' matmul and whole-vector arithmetic unroll into per-component
    # stream assignments since round 3 — served natively.)
    # (Horizontal regions serve NATIVELY at domains with max(ni, nj) >= 32
    # since round 3 — the Mosaic wedge hazard is confined to small shapes
    # and gated by pallas_codegen._REGION_HW_FLOOR; sub-floor region
    # stencils fall back to XLA transparently.)
}


def apply_exclusion(backend: str, *features: str) -> None:
    """Skip/xfail the current test according to the matrix."""
    table = BACKEND_SKIP_TEST_MATRIX.get(backend, {})
    for feature in features:
        action = table.get(feature)
        if action == SKIP:
            pytest.skip(f"{backend} does not support {feature}")
        if action == XFAIL:
            pytest.xfail(f"{backend} known-broken for {feature}")


def expects_native_kernel(backend: str, *features: str) -> bool:
    """False when any feature is served by the XLA fallback on this
    backend — strategy-assertion tests use this instead of hardcoding."""
    table = BACKEND_SKIP_TEST_MATRIX.get(backend, {})
    return not any(table.get(f) == XLA_FALLBACK for f in features)
