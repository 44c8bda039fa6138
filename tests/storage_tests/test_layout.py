"""Layout registry tests (reference: storage/cartesian/layout_registry.py)."""

from gt4py_tpu.storage import LayoutInfo, layout_from_name, register_layout
from gt4py_tpu.storage.layout import is_tpu_backend


def test_builtin_backends_registered():
    for name in ("debug", "numpy", "jax", "tpu:pallas"):
        assert layout_from_name(name) is not None


def test_tpu_layout_is_k_leading():
    info = layout_from_name("tpu:pallas")
    assert info.device == "tpu"
    # physical order K, I, J: K has the smallest layout_map rank position
    assert info.physical_order() == (2, 0, 1)


def test_register_custom():
    register_layout("custom", LayoutInfo(alignment=32, device="cpu", layout_map=(2, 1, 0)))
    assert layout_from_name("custom").alignment == 32
    assert not is_tpu_backend("custom")
