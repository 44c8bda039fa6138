

def test_empty_poison_fill(monkeypatch):
    """GT4PY_DEBUG_POISON_EMPTY restores the uninitialized-memory signal
    (out-of-domain writes become visible as surviving NaNs)."""
    import numpy as np

    from gt4py_tpu import storage

    monkeypatch.setenv("GT4PY_DEBUG_POISON_EMPTY", "1")
    f = storage.empty((3, 3, 2))
    assert np.isnan(np.asarray(f)).all()
    i = storage.empty((2, 2, 2), dtype=np.int32)
    assert (np.asarray(i) == np.iinfo(np.int32).max).all()
    monkeypatch.setenv("GT4PY_DEBUG_POISON_EMPTY", "0")
    z = storage.empty((2, 2, 2))
    assert (np.asarray(z) == 0).all()
