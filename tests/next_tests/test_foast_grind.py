"""Randomized FOAST-equivalence grind: generated straight-line operator
definitions (shadowing, duplicate subtrees, dead chains, literal branches)
must execute identically through the FOAST pipeline and the raw
definition.

The generator emits SOURCE (the frontend reads definitions via
inspect.getsource, so functions must live in a real module file); a
temp module is written once per session and imported. Deterministic
seeds — failures reproduce by seed number.

Reference analog: hypothesis suites over the cartesian frontend
(tests/cartesian_tests) + iterator transform tests; this targets the
FOAST passes specifically (cse version keys, dce liveness, fold edges).
"""

import importlib.util
import random
import sys

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import Dimension

I = Dimension("I")
J = Dimension("J")

N_PROGRAMS = 40
_BINOPS = ["+", "-", "*"]


def _gen_expr(rng: random.Random, names: list, depth: int) -> str:
    """Random expression over in-scope names; biased toward reuse so CSE
    has duplicated subtrees to find."""
    if depth == 0 or rng.random() < 0.3:
        r = rng.random()
        if r < 0.55:
            return rng.choice(names)
        if r < 0.8:
            return repr(round(rng.uniform(-3, 3), 3))
        return repr(rng.randint(-4, 4)) + ".0"
    r = rng.random()
    if r < 0.6:
        op = rng.choice(_BINOPS)
        return (
            f"({_gen_expr(rng, names, depth - 1)} {op} "
            f"{_gen_expr(rng, names, depth - 1)})"
        )
    if r < 0.75:
        return f"(-{_gen_expr(rng, names, depth - 1)})"
    if r < 0.9:
        # comparison routed through where() — field-valued select
        c = (
            f"({_gen_expr(rng, names, depth - 1)} "
            f"{rng.choice(['<', '>', '<=', '>='])} "
            f"{_gen_expr(rng, names, depth - 1)})"
        )
        return (
            f"where({c}, {_gen_expr(rng, names, depth - 1)}, "
            f"{_gen_expr(rng, names, depth - 1)})"
        )
    # literal-condition if-expression (folds to one branch)
    cond = rng.choice(["True", "False", "(1 < 2)", "(3.0 <= 1.0)"])
    return (
        f"({_gen_expr(rng, names, depth - 1)} if {cond} else "
        f"{_gen_expr(rng, names, depth - 1)})"
    )


def _gen_program(seed: int) -> str:
    rng = random.Random(seed)
    lines = [f"def op_{seed}(a, b):"]
    names = ["a", "b"]
    n_stmts = rng.randint(3, 8)
    for i in range(n_stmts):
        r = rng.random()
        if r < 0.25 and len(names) > 2:
            target = rng.choice(names[2:])  # shadow: stress CSE versioning
        else:
            target = f"t{i}"
        expr = _gen_expr(rng, names, rng.randint(1, 3))
        if rng.random() < 0.5 and "(" in expr:
            # duplicate the subtree in a second statement -> CSE fodder
            lines.append(f"    {target} = {expr} + {expr}")
        else:
            lines.append(f"    {target} = {expr}")
        if target not in names:
            names.append(target)
        if rng.random() < 0.2:
            lines.append(f"    dead_{i} = {_gen_expr(rng, names, 2)}")
    # literal-condition statement if (folds away or keeps one branch)
    if rng.random() < 0.4:
        keep = rng.choice(names[2:]) if len(names) > 2 else "a"
        lines.append(f"    if {rng.choice(['True', 'False'])}:")
        lines.append(f"        {keep} = {keep} * 1.5")
    picks = rng.sample(names, min(len(names), 3))
    if "a" not in picks and "b" not in picks:
        picks.append("a")  # result must be field-valued
    lines.append(f"    return {' + '.join(picks)}")
    return "\n".join(lines)


@pytest.fixture(scope="module")
def grind_module(tmp_path_factory):
    path = tmp_path_factory.mktemp("foast_grind") / "foast_grind_defs.py"
    src = ["from gt4py_tpu.next.fbuiltins import where", ""]
    for seed in range(N_PROGRAMS):
        src.append(_gen_program(seed))
        src.append("")
    path.write_text("\n".join(src))
    spec = importlib.util.spec_from_file_location("foast_grind_defs", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["foast_grind_defs"] = mod
    spec.loader.exec_module(mod)
    yield mod
    sys.modules.pop("foast_grind_defs", None)


@pytest.mark.parametrize("seed", range(N_PROGRAMS))
def test_foast_equivalence(grind_module, seed):
    fn = getattr(grind_module, f"op_{seed}")
    op = gtx.field_operator(fn, backend="jax")
    rng = np.random.default_rng(seed)
    a = gtx.as_field([I, J], rng.uniform(-2, 2, (7, 6)))
    b = gtx.as_field([I, J], rng.uniform(-2, 2, (7, 6)))
    out_foast = gtx.zeros({I: 7, J: 6})
    op(a, b, out=out_foast)
    out_raw = gtx.zeros({I: 7, J: 6})
    op.with_transforms(enabled=False)(a, b, out=out_raw)
    np.testing.assert_array_equal(out_foast.asnumpy(), out_raw.asnumpy())
    # the pipeline must have actually served (no silent fallback)
    assert "foast_fallback_reason" not in op.__dict__


@pytest.mark.parametrize("seed", range(0, N_PROGRAMS, 4))
def test_foast_oracle_equivalence(grind_module, seed):
    """FOAST-on-jax vs raw-on-numpy (fully independent arithmetic path)."""
    fn = getattr(grind_module, f"op_{seed}")
    op = gtx.field_operator(fn, backend="jax")
    rng = np.random.default_rng(1000 + seed)
    a = gtx.as_field([I, J], rng.uniform(-2, 2, (5, 4)))
    b = gtx.as_field([I, J], rng.uniform(-2, 2, (5, 4)))
    out_jax = gtx.zeros({I: 5, J: 4})
    op(a, b, out=out_jax)
    out_np = gtx.zeros({I: 5, J: 4})
    op.with_backend("numpy")(a, b, out=out_np)
    np.testing.assert_allclose(
        out_jax.asnumpy(), out_np.asnumpy(), rtol=1e-12, atol=1e-12
    )
