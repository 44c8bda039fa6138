"""FOAST textual round-trip: ``parse(pretty(ir)) == normalize(ir)``.

Mirrors the reference's ITIR pretty printer/parser round-trip tests
(/root/reference/tests/next_tests/unit_tests/iterator_tests/
test_pretty_printer.py, test_pretty_parser.py) for this framework's
field-view IR, plus hand-authored TEXTUAL pass-level tests — the workflow
the text form exists for: author IR as text, run a pass, assert on text.
"""

import numpy as np
import pytest

from gt4py_tpu.next import foast, foast_passes, foast_pretty


# --- operator corpus ------------------------------------------------------------
# Deliberately diverse: shifts, reductions, ternaries, tuples, slices,
# kwargs, attributes, unary/bool/compare ops, if-statements, augmented
# assignment, multi-target and tuple-target assignment, kw-only params.

def op_lap(f, Ioff):
    return (f(Ioff[1]) + f(Ioff[-1])) - 2.0 * f


def op_reduce(ef, V2E, V2EDim, neighbor_sum):
    s = neighbor_sum(ef(V2E), axis=V2EDim)
    return s * 0.5


def op_ternary(a, b):
    c = a if True else b
    return c + (a if b else a)


def op_tuples(a, b):
    x, y = a, b
    t = (x, y, (a + b))
    one = (a,)
    return t[0] + one[0]


def op_chain(a):
    u = v = a * 2.0
    u += 1.0
    return u / v


def op_control(a, flag):
    if flag:
        r = a + 1.0
    else:
        r = a - 1.0
    return r


def op_misc(a, b):
    m = -a
    n = not True
    p = (a < b) & (a != b)
    q = a[1:3, ::2]
    w = a.T
    return m + p + q + w if n else b


def op_kwonly(a, *, scale):
    return a * scale


def op_bool(a, b):
    return (True and False) or (a < b)


CORPUS = [
    op_lap, op_reduce, op_ternary, op_tuples, op_chain,
    op_control, op_misc, op_kwonly, op_bool,
]


@pytest.mark.parametrize("defn", CORPUS, ids=lambda f: f.__name__)
def test_roundtrip(defn):
    ir = foast.func_to_foast(defn)
    text = foast_pretty.pretty(ir)
    back = foast_pretty.parse(text)
    assert back == foast_pretty.normalize(ir)
    # pretty is a fixpoint of parse∘pretty
    assert foast_pretty.pretty(back) == text


def test_roundtrip_after_passes():
    """Pass outputs (folded literals, CSE temps) round-trip too."""
    ir = foast.func_to_foast(op_misc)
    ir = foast_passes.fold_constants(ir)
    ir = foast_passes.eliminate_common_subexpressions(ir)
    ir = foast_passes.eliminate_dead_code(ir)
    text = foast_pretty.pretty(ir)
    assert foast_pretty.parse(text) == foast_pretty.normalize(ir)


def test_negative_literal_normalization():
    """UnaryOp('-', Literal(v)) and Literal(-v) print identically; parse
    canonicalizes to the folded literal."""
    ir = foast_pretty.parse("def f(a):\n    return a + -2.5\n")
    (ret,) = ir.body
    assert isinstance(ret.value.right, foast.Literal)
    assert ret.value.right.value == -2.5


def test_parse_rejects_out_of_subset():
    with pytest.raises(foast.FoastUnsupported):
        foast_pretty.parse("def f(a):\n    for i in a:\n        pass\n")
    with pytest.raises(foast.FoastUnsupported):
        foast_pretty.parse("x = 1\n")  # no function definition
    with pytest.raises(foast.FoastUnsupported):
        foast_pretty.parse("def f(:\n")  # syntax error


# --- hand-authored textual pass tests --------------------------------------------


def test_textual_constant_folding():
    ir = foast_pretty.parse(
        "def f(a):\n"
        "    c = (2.0 * 3.0) + (1.0 - 1.0)\n"
        "    return a * c\n"
    )
    folded = foast_passes.fold_constants(ir)
    text = foast_pretty.pretty(folded)
    assert "c = 6.0" in text
    assert "2.0 * 3.0" not in text


def test_textual_dce():
    ir = foast_pretty.parse(
        "def f(a):\n"
        "    dead = a * 41.0\n"
        "    live = a + 1.0\n"
        "    return live\n"
    )
    pruned = foast_passes.eliminate_dead_code(ir)
    text = foast_pretty.pretty(pruned)
    assert "dead" not in text
    assert "live = (a + 1.0)" in text


def test_textual_cse():
    ir = foast_pretty.parse(
        "def f(a, b):\n"
        "    x = (a * b) + (a * b)\n"
        "    return x\n"
    )
    cse = foast_passes.eliminate_common_subexpressions(ir)
    text = foast_pretty.pretty(cse)
    # the repeated (a * b) is hoisted into a single temp read twice
    assert text.count("(a * b)") == 1
