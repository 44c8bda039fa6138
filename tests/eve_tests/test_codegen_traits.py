"""eve codegen / traits / trees breadth (reference
tests/eve_tests/unit_tests/test_codegen.py, test_traits.py,
test_trees.py: templated generation, symbol tables, tree walks)."""

import pytest

from gt4py_tpu import eve
from gt4py_tpu.eve import codegen
from gt4py_tpu.eve.concepts import Node, datamodel


@datamodel
class Leaf(Node):
    name: str = ""
    value: int = 0


@datamodel
class Branch(Node):
    label: str = ""
    children: list = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.children is None:
            self.children = []


# --- TemplatedGenerator -------------------------------------------------------


class DumpGen(codegen.TemplatedGenerator):
    Leaf = codegen.FormatTemplate("{name}={value}")
    Branch = codegen.FormatTemplate("[{label}: {children}]")


def test_templated_generator_renders_tree():
    tree = Branch(label="top", children=[Leaf(name="a", value=1), Leaf(name="b", value=2)])
    out = DumpGen.apply(tree)
    assert "a=1" in out and "b=2" in out and out.startswith("[top:")


def test_visit_method_overrides_template():
    class Gen(DumpGen):
        def visit_Leaf(self, node, **kwargs):
            return f"<{node.name}>"

    tree = Branch(label="t", children=[Leaf(name="x", value=9)])
    assert "<x>" in Gen.apply(tree)


def test_string_template_variant():
    class Gen(codegen.TemplatedGenerator):
        Leaf = codegen.StringTemplate("$name/$value")

    assert Gen.apply(Leaf(name="n", value=3)) == "n/3"


def test_untemplated_node_raises():
    class Gen(codegen.TemplatedGenerator):
        pass

    with pytest.raises(NotImplementedError, match="No template"):
        Gen.apply(Leaf(name="x", value=1))


def test_generic_dump_fallback():
    class Gen(codegen.TemplatedGenerator):
        def generic_dump(self, node, children):
            return type(node).__name__

    assert Gen.apply(Leaf(name="x", value=1)) == "Leaf"


def test_template_inherited_through_mro():
    @datamodel
    class SpecialLeaf(Leaf):
        pass

    class Gen(codegen.TemplatedGenerator):
        Leaf = codegen.FormatTemplate("{name}")

    assert Gen.apply(SpecialLeaf(name="s", value=0)) == "s"


# --- TextBlock ----------------------------------------------------------------


def test_text_block_indentation():
    tb = codegen.TextBlock()
    tb.append("def f():")
    with tb.indented():
        tb.append("return 1")
    tb.append("x = f()")
    assert tb.text == "def f():\n    return 1\nx = f()"


def test_text_block_empty_lines_and_extend():
    tb = codegen.TextBlock(indent_size=2)
    tb.extend(["a", "b"]).empty_line().append("c")
    assert tb.text == "a\nb\n\nc"


def test_format_source_python():
    out = codegen.format_source("python", "x=1\ny  =  2\n")
    # Formats with black when importable; whitespace-normalized otherwise.
    assert ("x = 1" in out) or (out == "x=1\ny  =  2\n")


def test_format_source_other_language_passthrough():
    out = codegen.format_source("cpp", "  int x;  ")
    assert out.strip() == "int x;"


# --- Name / case styles -------------------------------------------------------


def test_name_case_styles():
    assert codegen.Name("snake").render("MyFieldName") == "my_field_name"
    assert codegen.Name("pascal").render("my_field_name") == "MyFieldName"


# --- traits: symbol tables ----------------------------------------------------


def test_collect_symbols_and_validate_refs():
    from gt4py_tpu.eve.concepts import SymbolName, SymbolRef
    from gt4py_tpu.eve.traits import collect_symbols, validate_symbol_refs

    @datamodel
    class Decl(Node):
        name: SymbolName = ""

    @datamodel
    class Use(Node):
        ref: SymbolRef = ""

    from gt4py_tpu.eve.traits import SymbolTableTrait

    @datamodel
    class Prog(Node, SymbolTableTrait):
        decls: list = None  # type: ignore[assignment]
        uses: list = None  # type: ignore[assignment]

        def __post_init__(self):
            self.decls = self.decls or []
            self.uses = self.uses or []

    good = Prog(decls=[Decl(name=SymbolName("a"))], uses=[Use(ref=SymbolRef("a"))])
    table = collect_symbols(good)
    assert "a" in table
    validate_symbol_refs(good)  # no raise

    bad = Prog(decls=[Decl(name=SymbolName("a"))], uses=[Use(ref=SymbolRef("zz"))])
    with pytest.raises(Exception, match="zz"):
        validate_symbol_refs(bad)


# --- trees --------------------------------------------------------------------


def test_walk_values_and_walk_type():
    from gt4py_tpu.eve.trees import walk_type, walk_values

    tree = Branch(
        label="root",
        children=[
            Leaf(name="a", value=1),
            Branch(label="mid", children=[Leaf(name="b", value=2)]),
        ],
    )
    leaves = list(walk_type(tree, Leaf))
    assert {leaf.name for leaf in leaves} == {"a", "b"}
    all_nodes = [n for n in walk_values(tree) if isinstance(n, Node)]
    assert len(all_nodes) == 4


# --- pattern matching ---------------------------------------------------------


def test_object_pattern_matches_partial_attrs():
    from gt4py_tpu.eve.pattern_matching import ObjectPattern

    node = Leaf(name="x", value=3)
    assert ObjectPattern(Leaf, name="x").match(node)
    assert ObjectPattern(Leaf).match(node)  # no constraints
    assert not ObjectPattern(Leaf, name="y").match(node)
    assert not ObjectPattern(Branch).match(node)  # wrong class


def test_object_pattern_nested_and_sequences():
    from gt4py_tpu.eve.pattern_matching import ObjectPattern, get_differences

    tree = Branch(label="t", children=[Leaf(name="a", value=1), Leaf(name="b", value=2)])
    pat = ObjectPattern(
        Branch,
        children=[ObjectPattern(Leaf, name="a"), ObjectPattern(Leaf, value=2)],
    )
    assert pat.match(tree)
    bad = ObjectPattern(Branch, children=[ObjectPattern(Leaf, name="z")])
    diffs = list(get_differences(bad, tree))
    assert diffs
    assert any("length" in msg for _, msg in diffs)


def test_object_pattern_raise_exception_lists_paths():
    from gt4py_tpu.eve.pattern_matching import ObjectPattern

    node = Branch(label="top", children=[Leaf(name="a", value=1)])
    pat = ObjectPattern(
        Branch, label="other", children=[ObjectPattern(Leaf, value=9)]
    )
    with pytest.raises(ValueError) as exc:
        pat.match(node, raise_exception=True)
    msg = str(exc.value)
    assert ".label" in msg and ".children[0].value" in msg


def test_get_differences_dicts_and_missing_attr():
    from gt4py_tpu.eve.pattern_matching import ObjectPattern, get_differences

    assert not list(get_differences({"k": 1}, {"k": 1, "extra": 2}))
    assert list(get_differences({"k": 1}, {"other": 1}))
    diffs = list(get_differences(ObjectPattern(Leaf, nope=1), Leaf(name="x")))
    assert diffs and diffs[0][1] == "missing attribute"
