"""gt4py_tpu.eve — lean IR-node framework.

TPU-native re-design of the reference's ``gt4py.eve`` package
(/root/reference/src/gt4py/eve/concepts.py:157, visitors.py:23,150, traits.py:22).
The reference builds IR nodes on attrs-based "datamodels" with runtime type
validation and a templated C++ code generator; here codegen targets JAX/Pallas
Python callables, so the node kit is a small dataclass + visitor toolkit:

- :class:`Node` — dataclass-based IR node with child iteration.
- :class:`NodeVisitor` — class-name dispatch with MRO fallback (mirrors
  eve/visitors.py:102 behaviour).
- :class:`NodeTranslator` — rebuilds trees, for rewriting passes.
- tree walking helpers (:func:`walk_values`, :func:`pre_walk_items`).
- :class:`SourceLocation` for DSL error reporting.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields
from typing import Any, Iterator, Optional


__all__ = [
    "Node",
    "NodeVisitor",
    "NodeTranslator",
    "SourceLocation",
    "datamodel",
    "field",
    "walk_values",
    "walk_type",
    "pre_walk_items",
]


@dataclass(frozen=True)
class SourceLocation:
    """Source position of a DSL construct (reference: eve/concepts.py:114)."""

    line: int
    column: int
    filename: str = "<unknown>"
    end_line: Optional[int] = None
    end_column: Optional[int] = None

    def __str__(self) -> str:
        return f"{self.filename}:{self.line}:{self.column}"


class Node:
    """Base class for IR nodes.

    Subclasses are plain (mutable) dataclasses created with the
    :func:`datamodel` decorator. Equality is structural over children;
    hash is identity (nodes are used as dict keys in analyses).
    """

    __slots__ = ()

    def iter_children_items(self) -> Iterator[tuple[str, Any]]:
        for f in fields(self):  # type: ignore[arg-type]
            yield f.name, getattr(self, f.name)

    def iter_children_values(self) -> Iterator[Any]:
        for _, value in self.iter_children_items():
            yield value

    def copy(self, **overrides: Any) -> "Node":
        return dataclasses.replace(self, **overrides)  # type: ignore[type-var]

    def __eq__(self, other: Any) -> bool:
        if self is other:
            return True
        if type(self) is not type(other):
            return NotImplemented
        return all(
            getattr(self, f.name) == getattr(other, f.name)
            for f in fields(self)  # type: ignore[arg-type]
        )

    def __hash__(self) -> int:
        return id(self)

    def __repr__(self) -> str:
        parts = ", ".join(f"{k}={v!r}" for k, v in self.iter_children_items())
        return f"{type(self).__name__}({parts})"


def datamodel(cls=None, /, **kwargs):
    """Decorator turning a class into an IR-node dataclass.

    Equivalent role to the reference's ``@datamodel``
    (eve/datamodels/core.py:270) without runtime type validation —
    the frontend validates shapes/types before node construction.
    """

    def wrap(c):
        c = dataclasses.dataclass(eq=False, repr=False, **kwargs)(c)
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def _iter_tree_children(value: Any) -> Iterator[Any]:
    if isinstance(value, Node):
        yield from value.iter_children_values()
    elif isinstance(value, (list, tuple)):
        yield from value
    elif isinstance(value, dict):
        yield from value.values()


def walk_values(node: Any) -> Iterator[Any]:
    """Pre-order traversal of all values in the tree (reference: eve/trees.py)."""
    yield node
    for child in _iter_tree_children(node):
        yield from walk_values(child)


def walk_type(node: Any, node_type: type) -> Iterator[Any]:
    for value in walk_values(node):
        if isinstance(value, node_type):
            yield value


def pre_walk_items(node: Any, *, _key: Any = None) -> Iterator[tuple[Any, Any]]:
    yield _key, node
    if isinstance(node, Node):
        for key, child in node.iter_children_items():
            yield from pre_walk_items(child, _key=key)
    elif isinstance(node, (list, tuple)):
        for i, child in enumerate(node):
            yield from pre_walk_items(child, _key=i)
    elif isinstance(node, dict):
        for key, child in node.items():
            yield from pre_walk_items(child, _key=key)


class NodeVisitor:
    """Visitor with per-class dispatch and MRO fallback.

    ``visit(node)`` dispatches to ``visit_<ClassName>`` for the node's class
    or the closest base class defining such a method; otherwise
    :meth:`generic_visit` recurses into children. Mirrors the dispatch
    contract of the reference (eve/visitors.py:102,143).
    """

    def visit(self, node: Any, **kwargs: Any) -> Any:
        method = None
        for cls in type(node).__mro__:
            method = getattr(self, f"visit_{cls.__name__}", None)
            if method is not None:
                break
        if method is None:
            method = self.generic_visit
        return method(node, **kwargs)

    def generic_visit(self, node: Any, **kwargs: Any) -> Any:
        for child in _iter_tree_children(node):
            if isinstance(child, (Node, list, tuple, dict)):
                self.visit(child, **kwargs)
        return None

    def visit_list(self, node: list, **kwargs: Any) -> Any:
        for item in node:
            self.visit(item, **kwargs)

    def visit_tuple(self, node: tuple, **kwargs: Any) -> Any:
        for item in node:
            self.visit(item, **kwargs)


class NodeTranslator(NodeVisitor):
    """Visitor that rebuilds the tree; unhandled nodes are reconstructed
    with visited children (reference: eve/visitors.py:150)."""

    def generic_visit(self, node: Any, **kwargs: Any) -> Any:
        if isinstance(node, Node):
            new_fields = {
                name: self.visit(value, **kwargs) if _is_tree(value) else value
                for name, value in node.iter_children_items()
            }
            return type(node)(**new_fields)
        if isinstance(node, list):
            return [self.visit(v, **kwargs) if _is_tree(v) else v for v in node]
        if isinstance(node, tuple):
            return tuple(self.visit(v, **kwargs) if _is_tree(v) else v for v in node)
        if isinstance(node, dict):
            return {k: self.visit(v, **kwargs) if _is_tree(v) else v for k, v in node.items()}
        return node

    def visit_list(self, node: list, **kwargs: Any) -> Any:
        return self.generic_visit(node, **kwargs)

    def visit_tuple(self, node: tuple, **kwargs: Any) -> Any:
        return self.generic_visit(node, **kwargs)


def _is_tree(value: Any) -> bool:
    return isinstance(value, (Node, list, tuple, dict))
