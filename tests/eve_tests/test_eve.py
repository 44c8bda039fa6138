"""Unit tests for the eve IR kit (reference: tests/eve_tests/)."""

from gt4py_tpu import eve
from gt4py_tpu.eve import Node, NodeTranslator, NodeVisitor, datamodel, field


@datamodel
class Leaf(Node):
    value: int = 0


@datamodel
class Branch(Node):
    left: Node = None
    right: Node = None
    tag: str = ""


def make_tree():
    return Branch(left=Leaf(value=1), right=Branch(left=Leaf(value=2), right=Leaf(value=3)))


def test_structural_equality_identity_hash():
    a, b = make_tree(), make_tree()
    assert a == b
    assert hash(a) != hash(b)  # identity hash: usable as analysis keys
    assert a != Branch(left=Leaf(value=9), right=None)


def test_walk():
    tree = make_tree()
    leaves = [n.value for n in eve.walk_type(tree, Leaf)]
    assert leaves == [1, 2, 3]


def test_visitor_dispatch_with_mro_fallback():
    visited = []

    class V(NodeVisitor):
        def visit_Leaf(self, node, **kwargs):
            visited.append(node.value)

    V().visit(make_tree())
    assert visited == [1, 2, 3]

    # MRO fallback: a subclass of Leaf dispatches to visit_Leaf.
    @datamodel
    class SpecialLeaf(Leaf):
        pass

    visited.clear()
    V().visit(Branch(left=SpecialLeaf(value=7), right=Leaf(value=8)))
    assert visited == [7, 8]


def test_translator_rebuilds():
    class Doubler(NodeTranslator):
        def visit_Leaf(self, node, **kwargs):
            return Leaf(value=node.value * 2)

    tree = make_tree()
    new = Doubler().visit(tree)
    assert [n.value for n in eve.walk_type(new, Leaf)] == [2, 4, 6]
    assert [n.value for n in eve.walk_type(tree, Leaf)] == [1, 2, 3]  # original intact


def test_copy_with_overrides():
    leaf = Leaf(value=5)
    assert leaf.copy(value=6).value == 6
    assert leaf.value == 5


def test_source_location_str():
    loc = eve.SourceLocation(line=3, column=7, filename="x.py")
    assert "x.py:3:7" == str(loc)


# --- codegen (reference eve/codegen.py:563,220) -------------------------------


def test_templated_generator():
    from gt4py_tpu import eve
    from gt4py_tpu.eve.codegen import FormatTemplate, TemplatedGenerator

    @eve.datamodel
    class Lit(eve.Node):
        value: int

    @eve.datamodel
    class Add(eve.Node):
        left: eve.Node
        right: eve.Node

    class Gen(TemplatedGenerator):
        Lit = FormatTemplate("{_this_.value}")
        Add = FormatTemplate("({left} + {right})")

    tree = Add(left=Lit(value=1), right=Add(left=Lit(value=2), right=Lit(value=3)))
    assert Gen.apply(tree) == "(1 + (2 + 3))"


def test_text_block_and_format_source():
    from gt4py_tpu.eve.codegen import TextBlock, format_source

    tb = TextBlock()
    tb.append("def f():")
    with tb.indented():
        tb.append("return 1")
    assert tb.text == "def f():\n    return 1"
    out = format_source("python", "x=1")
    assert out.strip().replace(" ", "") == "x=1"


# --- validated datamodels (reference eve/datamodels/core.py:270,594,620) ------


def test_datamodel_type_validation():
    import pytest
    from typing import Optional
    from gt4py_tpu.eve import datamodels

    @datamodels.datamodel
    class Point:
        x: int
        y: float
        label: Optional[str] = None
        tags: tuple[str, ...] = ()

    Point(x=1, y=2.0, label="a", tags=("t",))
    Point(x=1, y=2, label=None)  # int acceptable as float
    with pytest.raises(datamodels.ValidationError, match="'x' expects int"):
        Point(x="no", y=2.0)
    with pytest.raises(datamodels.ValidationError):
        Point(x=1, y=2.0, tags=("a", 3))


def test_datamodel_field_and_root_validators():
    import pytest
    from gt4py_tpu.eve import datamodels

    @datamodels.datamodel
    class Range:
        lo: int
        hi: int

        @datamodels.validator("lo")
        def _lo_nonneg(self, value):
            if value < 0:
                raise datamodels.ValidationError("lo must be >= 0")

        @datamodels.root_validator
        def _ordered(self):
            if self.hi < self.lo:
                raise datamodels.ValidationError("hi < lo")

    Range(lo=0, hi=3)
    with pytest.raises(datamodels.ValidationError, match="lo must be"):
        Range(lo=-1, hi=3)
    with pytest.raises(datamodels.ValidationError, match="hi < lo"):
        Range(lo=5, hi=3)
