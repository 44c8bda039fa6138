"""eve kit breadth (reference unit suites under
/root/reference/tests/eve_tests/unit_tests/: test_datamodels.py,
test_pattern_matching.py, test_trees.py, test_type_definitions.py,
test_extended_typing.py behaviors mapped onto this framework's lean
eve implementation)."""

import pytest

from gt4py_tpu import eve
from gt4py_tpu.eve.datamodels import (
    ValidationError,
    datamodel,
    root_validator,
    validator,
)
from gt4py_tpu.eve.pattern_matching import ObjectPattern, get_differences
from gt4py_tpu.eve.trees import (
    post_walk_values,
    pre_walk_items,
    walk_type,
    walk_values,
)
from gt4py_tpu.eve.type_validation import TypeValidationError, assert_type
from gt4py_tpu.eve.utils import (
    CaseStyleConverter,
    FrozenNamespace,
    Namespace,
    UIDGenerator,
    content_hash,
)


# --- datamodels -----------------------------------------------------------------


def test_datamodel_type_checking():
    @datamodel
    class Point:
        x: int
        y: int

    p = Point(x=1, y=2)
    assert (p.x, p.y) == (1, 2)
    with pytest.raises((ValidationError, TypeError)):
        Point(x="a", y=2)


def test_datamodel_field_validator():
    @datamodel
    class Interval:
        lo: int
        hi: int

        @validator("hi")
        def _check_hi(self, value):
            if value < self.lo:
                raise ValueError("hi must be >= lo")

    Interval(lo=0, hi=3)
    with pytest.raises(ValueError, match="hi must be"):
        Interval(lo=3, hi=0)


def test_datamodel_root_validator():
    @datamodel
    class Range:
        start: int
        stop: int

        @root_validator
        def _check(self):
            if self.stop < self.start:
                raise ValueError("reversed range")

    Range(start=0, stop=1)
    with pytest.raises(ValueError, match="reversed"):
        Range(start=2, stop=1)


def test_datamodel_frozen():
    @datamodel(frozen=True)
    class F:
        a: int

    f = F(a=1)
    with pytest.raises(Exception):
        f.a = 2


def test_datamodel_validate_off():
    @datamodel(validate=False)
    class Loose:
        a: int

    assert Loose(a="anything").a == "anything"


# --- pattern matching -------------------------------------------------------------


def test_object_pattern_matches_subset_of_attributes():
    @datamodel
    class Node:
        name: str
        value: int

    n = Node(name="x", value=3)
    assert ObjectPattern(Node, name="x").match(n)
    assert not ObjectPattern(Node, name="y").match(n)
    assert ObjectPattern(Node, name="x", value=3).match(n)


def test_object_pattern_nested_and_diff_paths():
    @datamodel
    class Leaf:
        v: int

    @datamodel
    class Tree:
        left: Leaf
        right: Leaf

    t = Tree(left=Leaf(v=1), right=Leaf(v=2))
    assert ObjectPattern(Tree, left=ObjectPattern(Leaf, v=1)).match(t)
    bad = ObjectPattern(Tree, right=ObjectPattern(Leaf, v=9))
    diffs = list(get_differences(bad, t))
    assert diffs and any("right" in path for path, _ in diffs)
    with pytest.raises(ValueError, match="does not match"):
        bad.match(t, raise_exception=True)


# --- trees -----------------------------------------------------------------------


def test_tree_walks_cover_nested_containers():
    tree = {"a": [1, {"b": 2}], "c": (3,)}
    vals = list(walk_values(tree))
    for expect in (1, 2, 3):
        assert expect in vals
    post = list(post_walk_values(tree))
    assert set(map(str, post)) >= {"1", "2", "3"}


def test_walk_type_filters():
    tree = [1, "x", [2.5, "y", [3]]]
    assert sorted(walk_type(tree, str)) == ["x", "y"]
    assert sorted(walk_type(tree, int))[-1] == 3


def test_pre_walk_items_yields_keys():
    tree = {"k": [10, 20]}
    items = list(pre_walk_items(tree))
    keys = [k for k, _ in items]
    assert "k" in keys and 0 in keys and 1 in keys


# --- utils -----------------------------------------------------------------------


def test_content_hash_stable_and_sensitive():
    a = content_hash({"x": 1, "y": [1, 2]})
    b = content_hash({"y": [1, 2], "x": 1})
    c = content_hash({"x": 2, "y": [1, 2]})
    assert a == b  # order-insensitive over dicts
    assert a != c


def test_case_style_converter_roundtrips():
    assert CaseStyleConverter.convert("myVariableName", "snake") == "my_variable_name"
    assert CaseStyleConverter.convert("my_variable_name", "camel") == "myVariableName"
    assert CaseStyleConverter.convert("my-variable-name", "pascal") == "MyVariableName"
    assert CaseStyleConverter.convert("MyVariableName", "const") == "MY_VARIABLE_NAME"
    with pytest.raises(ValueError, match="Unknown case style"):
        CaseStyleConverter.convert("x", "shouting")


def test_namespaces():
    ns = Namespace(a=1)
    ns.b = 2
    assert ns.a == 1 and ns["b"] == 2
    f = FrozenNamespace(x=1)
    assert f.x == 1
    with pytest.raises(Exception):
        f.x = 2


def test_uid_generator_unique_and_prefixed():
    gen = UIDGenerator(prefix="tmp")
    a, b = gen.sequential_id(), gen.sequential_id()
    assert a != b and a.startswith("tmp") and b.startswith("tmp")


# --- type validation ---------------------------------------------------------------


def test_assert_type_simple_and_generic():
    assert_type(3, int)
    assert_type([1, 2], list[int])
    assert_type({"a": 1}, dict[str, int])
    with pytest.raises(TypeValidationError):
        assert_type("3", int)
    with pytest.raises(TypeValidationError):
        assert_type([1, "2"], list[int])


def test_assert_type_optional_and_union():
    from typing import Optional, Union

    assert_type(None, Optional[int])
    assert_type(3, Union[int, str])
    with pytest.raises(TypeValidationError):
        assert_type(3.5, Union[int, str])
