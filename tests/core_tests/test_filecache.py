"""FileCache + locking tests (reference counterpart: _core/filecache.py,
_core/locking.py)."""

import multiprocessing
import os

import pytest

from gt4py_tpu.core.filecache import FileCache
from gt4py_tpu.core.locking import lock


def test_roundtrip(tmp_path):
    c = FileCache(str(tmp_path / "cache"))
    c["key"] = {"a": 1, "b": [1, 2, 3]}
    assert "key" in c
    assert c["key"] == {"a": 1, "b": [1, 2, 3]}
    assert c.get("missing") is None
    with pytest.raises(KeyError):
        c["missing"]


def test_setdefault_and_delete(tmp_path):
    c = FileCache(str(tmp_path / "cache"))
    assert c.setdefault("k", 41) == 41
    assert c.setdefault("k", 42) == 41
    del c["k"]
    assert "k" not in c
    with pytest.raises(KeyError):
        del c["k"]


def test_survives_new_instance(tmp_path):
    root = str(tmp_path / "cache")
    FileCache(root)["x"] = (1, 2)
    assert FileCache(root)["x"] == (1, 2)


def test_torn_write_treated_as_missing(tmp_path):
    c = FileCache(str(tmp_path / "cache"))
    c["x"] = 1
    path = c._path("x")
    with open(path, "wb") as f:
        f.write(b"\x80garbage")
    with pytest.raises(KeyError):
        c["x"]
    assert "x" not in c  # poisoned entry removed


def test_clear(tmp_path):
    c = FileCache(str(tmp_path / "cache"))
    c["a"] = 1
    c["b"] = 2
    c.clear()
    assert "a" not in c and "b" not in c


def test_lock_reentrant(tmp_path):
    p = str(tmp_path / "l.lock")
    with lock(p):
        with lock(p):  # reentrant: no deadlock
            pass


def _hold_lock(path, acquired, release):
    from gt4py_tpu.core.locking import lock

    with lock(path):
        acquired.set()
        release.wait(10)


def test_lock_blocks_other_process(tmp_path):
    path = str(tmp_path / "l.lock")
    ctx = multiprocessing.get_context("fork")
    acquired = ctx.Event()
    release = ctx.Event()
    proc = ctx.Process(target=_hold_lock, args=(path, acquired, release))
    proc.start()
    try:
        assert acquired.wait(10)
        with pytest.raises(TimeoutError):
            with lock(path, timeout=0.2):
                pass
        release.set()
        proc.join(10)
        with lock(path, timeout=5):
            pass
    finally:
        release.set()
        proc.join(5)
