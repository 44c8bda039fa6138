"""PAST textual round-trip: ``parse_program(pretty_program(ir)) ==
normalize_program(ir)``.

Extends the FOAST textual IR (test_foast_pretty.py) to program level —
the reference's ITIR pretty printer/parser covers Program/SetAt nodes
(/root/reference/src/gt4py/next/iterator/pretty_printer.py,
pretty_parser.py); here the program IR is PAST and the text form covers
operator-call statements, ``out=``/``domain={...}`` arguments, and
kw-only scalar parameters — so program-level passes
(``static_scalar_params``, dead-temporary elimination) can be unit-tested
from hand-authored text, like the GTIR passes in
tests/cartesian_tests/test_passes_textual.py."""

import pytest

from gt4py_tpu.next import foast, foast_passes, foast_pretty, past


# --- program corpus ---------------------------------------------------------------
# Diverse on purpose: plain calls, out= tuples, dict domains, scalar
# temporaries feeding domains, kw-only params, if-statements, multiple
# statements, signed literals.

def prog_basic(a, b, out):
    op(a, b, out=out)


def prog_domain(a, out, n, I, J, op):
    op(a, out=out, domain={I: (0, n), J: (1, n + 1)})


def prog_temps(a, out, lo, hi, I, op):
    n = hi - lo
    m = n * 2
    op(a, out=out, domain={I: (lo, m)})


def prog_kwonly(a, out, op, *, scale):
    op(a, scale, out=out)


def prog_control(a, out, flag, op1, op2):
    if flag:
        op1(a, out=out)
    else:
        op2(a, out=out)


def prog_tuple_out(a, o1, o2, op):
    op(a, out=(o1, o2))


def prog_signed(a, out, op):
    op(a, -2.5, out=out, domain=None)


CORPUS = [
    prog_basic, prog_domain, prog_temps, prog_kwonly,
    prog_control, prog_tuple_out, prog_signed,
]


@pytest.mark.parametrize("defn", CORPUS, ids=lambda f: f.__name__)
def test_roundtrip(defn):
    ir = past.func_to_past(defn)
    text = foast_pretty.pretty_program(ir)
    back = foast_pretty.parse_program(text)
    assert back == foast_pretty.normalize_program(ir)
    # pretty_program is a fixpoint of parse_program∘pretty_program
    assert foast_pretty.pretty_program(back) == text


def test_roundtrip_after_passes():
    """Pass outputs (folded domain scalars, pruned temps) round-trip."""
    ir = past.func_to_past(prog_temps)
    ir = foast_passes.fold_constants(ir)
    ir = past.eliminate_dead_temporaries(ir)
    text = foast_pretty.pretty_program(ir)
    assert foast_pretty.parse_program(text) == foast_pretty.normalize_program(ir)


def test_parse_rejects_out_of_subset():
    with pytest.raises(foast.FoastUnsupported):
        foast_pretty.parse_program(
            "def p(a, out):\n    return a\n"  # programs return nothing
        )
    with pytest.raises(foast.FoastUnsupported):
        foast_pretty.parse_program("def p(*args):\n    pass\n")
    with pytest.raises(foast.FoastUnsupported):
        foast_pretty.parse_program("x = 1\n")  # no function definition


# --- hand-authored textual program-pass tests ---------------------------------------


def test_textual_static_scalar_params():
    """static_scalar_params from text: names reaching a domain= argument
    (directly or through temporaries) are static; field args are not."""
    ir = foast_pretty.parse_program(
        "def p(a, out, lo, hi, unused):\n"
        "    n = (hi - lo)\n"
        "    op(a, out=out, domain={I: (lo, n)})\n"
    )
    static = past.static_scalar_params(ir)
    assert static == frozenset({"lo", "hi"})


def test_textual_static_params_through_if():
    ir = foast_pretty.parse_program(
        "def p(a, out, flag, n):\n"
        "    if flag:\n"
        "        op(a, out=out, domain={I: (0, n)})\n"
        "    else:\n"
        "        op(a, out=out)\n"
    )
    static = past.static_scalar_params(ir)
    assert static == frozenset({"flag", "n"})


def test_textual_dead_temporary_elimination():
    """Dead chains vanish; temporaries consumed by a call statement stay."""
    ir = foast_pretty.parse_program(
        "def p(a, out, s):\n"
        "    live = (s * 2.0)\n"
        "    dead = (s + 41.0)\n"
        "    deader = (dead + 1.0)\n"
        "    op(a, live, out=out)\n"
    )
    pruned = past.eliminate_dead_temporaries(ir)
    text = foast_pretty.pretty_program(pruned)
    assert "dead" not in text
    assert "live = (s * 2.0)" in text
    assert "op(a, live, out=out)" in text


def test_textual_constant_folding_in_domain():
    ir = foast_pretty.parse_program(
        "def p(a, out):\n"
        "    op(a, out=out, domain={I: (0, (2 * 32))})\n"
    )
    folded = foast_passes.fold_constants(ir)
    text = foast_pretty.pretty_program(folded)
    assert "64" in text and "2 * 32" not in text


def test_pretty_matches_inspect_source():
    """The canonical text of a decorated program matches the executable
    codegen modulo parenthesization — both are valid Python with the same
    statements (the product `inspect(stage="past")` view)."""
    import numpy as np

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import Dimension

    I = Dimension("I")
    J = Dimension("J")
    IJField = gtx.Field[gtx.Dims[I, J], gtx.float64]

    @gtx.field_operator
    def _dbl(a: IJField) -> IJField:
        return a * 2.0

    @gtx.program
    def prog(a, out):
        _dbl(a, out=out)

    ir = past.func_to_past(prog.definition)
    text = foast_pretty.pretty_program(ir)
    assert "_dbl(a, out=out)" in text
    # and the parsed-back IR still type-checks + executes through PAST
    back = foast_pretty.parse_program(text)
    assert [type(s).__name__ for s in back.body] == ["CallStmt"]
    a = gtx.as_field([I, J], np.ones((4, 3)))
    out = gtx.zeros({I: 4, J: 3})
    prog(a, out)
    np.testing.assert_allclose(out.asnumpy(), 2.0)
