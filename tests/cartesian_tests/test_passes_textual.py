"""Pass-level unit tests over hand-authored TEXTUAL IRs (reference
pattern: tests/cartesian_tests/unit_tests/test_gtc/gtir_utils.py IR
factories feeding per-pass tests — here `gtir_pretty.parse` is the IR
builder, so each test states its input IR literally)."""

import numpy as np
import pytest

from gt4py_tpu.cartesian import gtir
from gt4py_tpu.cartesian.gtir_pretty import parse, pretty
from gt4py_tpu.cartesian.passes.definitive_assignment import (
    check_definitive_assignment,
)
from gt4py_tpu.cartesian.passes.extents import ExtentAnalysis
from gt4py_tpu.cartesian.passes.inline_temporaries import inline_temporaries
from gt4py_tpu.cartesian.passes.lowering import lower_control_flow
from gt4py_tpu.cartesian.passes.race_detection import detect_races
from gt4py_tpu.cartesian.passes.type_inference import infer_dtypes


# --- lowering: field-if -> masked assigns ------------------------------------


def test_lowering_field_if_becomes_masked_assigns():
    s = parse("""
    stencil t {
      field a:f64
      field b:f64
      computation(PARALLEL) {
        interval(start, end) {
          if ((a[0, 0, 0] > 0.0:f64):b1) {
            b[0, 0, 0] = 1.0:f64
          } else {
            b[0, 0, 0] = 2.0:f64
          }
        }
      }
    }
    """)
    lowered = lower_control_flow(s)
    stmts = lowered.vertical_loops[0].sections[0].body
    assert all(isinstance(st, gtir.Assign) for st in stmts)
    masked = [st for st in stmts if st.mask is not None]
    assert len(masked) == 2  # then-branch mask + negated else mask


def test_lowering_scalar_if_masks_via_temporary():
    """Scalar conditionals also flatten to masked assigns (one flat
    statement stream feeds every backend): the condition lands in a mask
    temporary, the body assign carries it."""
    s = parse("""
    stencil t {
      field a:f64
      scalar c:f64
      computation(PARALLEL) {
        interval(start, end) {
          sif ((c:f64 > 0.0:f64):b1) {
            a[0, 0, 0] = 1.0:f64
          }
        }
      }
    }
    """)
    lowered = lower_control_flow(s)
    stmts = lowered.vertical_loops[0].sections[0].body
    assert all(isinstance(st, gtir.Assign) for st in stmts)
    assert stmts[-1].mask is not None
    assert any(t.name.startswith("_mask") for t in lowered.temporaries)


# --- definitive assignment ----------------------------------------------------


def test_definitive_assignment_rejects_read_before_write():
    s = parse("""
    stencil t {
      field a:f64
      field out:f64
      temp tmp:f64
      computation(PARALLEL) {
        interval(start, end) {
          out[0, 0, 0] = tmp[0, 0, 0]
          tmp[0, 0, 0] = a[0, 0, 0]
        }
      }
    }
    """)
    with pytest.raises(Exception, match="tmp"):
        check_definitive_assignment(s)


def test_definitive_assignment_accepts_write_then_read():
    s = parse("""
    stencil t {
      field a:f64
      field out:f64
      temp tmp:f64
      computation(PARALLEL) {
        interval(start, end) {
          tmp[0, 0, 0] = a[0, 0, 0]
          out[0, 0, 0] = tmp[0, 0, 0]
        }
      }
    }
    """)
    check_definitive_assignment(s)  # no raise


# --- race detection -----------------------------------------------------------


def test_race_detection_rejects_shifted_self_read():
    s = parse("""
    stencil t {
      field a:f64
      computation(PARALLEL) {
        interval(start, end) {
          a[0, 0, 0] = a[1, 0, 0]
        }
      }
    }
    """)
    with pytest.raises(Exception, match="race|offset|shift"):
        detect_races(s)


def test_race_detection_allows_pure_pointwise():
    s = parse("""
    stencil t {
      field a:f64
      field b:f64
      computation(PARALLEL) {
        interval(start, end) {
          b[0, 0, 0] = (a[1, 0, 0] + a[-1, 0, 0]):f64
          b[0, 0, 0] = (b[0, 0, 0] * 2.0:f64):f64
        }
      }
    }
    """)
    detect_races(s)  # no raise


# --- dtype inference ----------------------------------------------------------


def test_infer_dtypes_fills_and_upcasts():
    s = parse("""
    stencil t {
      field i32:i32
      field f32:f32
      field out:f64
      computation(PARALLEL) {
        interval(start, end) {
          out[0, 0, 0] = (i32[0, 0, 0] + f32[0, 0, 0])
        }
      }
    }
    """)
    infer_dtypes(s)
    value = s.vertical_loops[0].sections[0].body[0].value
    assert value.dtype is not None
    assert np.dtype(value.dtype).kind == "f"


# --- temporary inlining -------------------------------------------------------


def test_inline_single_read_temporary():
    s = parse("""
    stencil t {
      field a:f64
      field out:f64
      temp tmp:f64
      computation(PARALLEL) {
        interval(start, end) {
          tmp[0, 0, 0] = (a[0, 0, 0] * 2.0:f64):f64
          out[0, 0, 0] = (tmp[0, 0, 0] + 1.0:f64):f64
        }
      }
    }
    """)
    inlined = inline_temporaries(s)
    assert not inlined.temporaries
    (stmt,) = inlined.vertical_loops[0].sections[0].body
    assert "tmp" not in pretty(inlined)
    assert isinstance(stmt.value, gtir.BinaryOp)


def test_inline_respects_expansion_cap():
    # tmp read 3 times with a 5-access definition: cap 4 forbids inlining.
    s = parse("""
    stencil t {
      field a:f64
      field out:f64
      temp tmp:f64
      computation(PARALLEL) {
        interval(start, end) {
          tmp[0, 0, 0] = ((((a[0, 0, 0] + a[1, 0, 0]):f64 + a[-1, 0, 0]):f64 + a[0, 1, 0]):f64 + a[0, -1, 0]):f64
          out[0, 0, 0] = ((tmp[0, 0, 0] + tmp[1, 0, 0]):f64 + tmp[0, 1, 0]):f64
        }
      }
    }
    """)
    kept = inline_temporaries(s, expansion_cap=4)
    assert any(t.name == "tmp" for t in kept.temporaries)
    inlined = inline_temporaries(s, expansion_cap=1000)
    assert not inlined.temporaries


# --- extents ------------------------------------------------------------------


def test_extent_analysis_through_temporary():
    s = parse("""
    stencil t {
      field a:f64
      field out:f64
      temp lap:f64
      computation(PARALLEL) {
        interval(start, end) {
          lap[0, 0, 0] = (a[1, 0, 0] + a[-1, 0, 0]):f64
          out[0, 0, 0] = (lap[0, 1, 0] - lap[0, -1, 0]):f64
        }
      }
    }
    """)
    infer_dtypes(s)
    ext = ExtentAnalysis(s)
    a_ext = ext.field_extents["a"]
    # a is read at I+-1 from lap, which itself executes at J+-1.
    assert a_ext.i == (-1, 1)
    assert a_ext.j == (-1, 1)
    lap_ext = ext.field_extents["lap"]
    assert lap_ext.j == (-1, 1)
