"""Config env-parsing tests (reference tests/next_tests/unit_tests/
test_config.py: boolean/int env parsing, lifetime enum, cache dirs)."""

import os

import pytest

from gt4py_tpu import config


def test_env_flag_to_bool_truthy(monkeypatch):
    for v in ("1", "true", "YES", "On"):
        monkeypatch.setenv("GT4PY_TEST_FLAG", v)
        assert config.env_flag_to_bool("GT4PY_TEST_FLAG", False) is True


def test_env_flag_to_bool_falsy(monkeypatch):
    for v in ("0", "false", "No", "OFF", ""):
        monkeypatch.setenv("GT4PY_TEST_FLAG", v)
        assert config.env_flag_to_bool("GT4PY_TEST_FLAG", True) is False


def test_env_flag_to_bool_default(monkeypatch):
    monkeypatch.delenv("GT4PY_TEST_FLAG", raising=False)
    assert config.env_flag_to_bool("GT4PY_TEST_FLAG", True) is True
    assert config.env_flag_to_bool("GT4PY_TEST_FLAG", False) is False


def test_env_flag_to_bool_invalid(monkeypatch):
    monkeypatch.setenv("GT4PY_TEST_FLAG", "maybe")
    with pytest.raises(ValueError, match="GT4PY_TEST_FLAG"):
        config.env_flag_to_bool("GT4PY_TEST_FLAG", False)


def test_env_flag_to_int(monkeypatch):
    monkeypatch.setenv("GT4PY_TEST_INT", "42")
    assert config.env_flag_to_int("GT4PY_TEST_INT", 0) == 42
    monkeypatch.delenv("GT4PY_TEST_INT")
    assert config.env_flag_to_int("GT4PY_TEST_INT", 7) == 7
    monkeypatch.setenv("GT4PY_TEST_INT", "nope")
    with pytest.raises(ValueError, match="GT4PY_TEST_INT"):
        config.env_flag_to_int("GT4PY_TEST_INT", 0)


def test_build_cache_lifetime_enum():
    assert config.BuildCacheLifetime("session") is config.BuildCacheLifetime.SESSION
    assert config.BuildCacheLifetime("persistent") is config.BuildCacheLifetime.PERSISTENT


def test_cache_dir_persistent(monkeypatch):
    monkeypatch.setattr(config, "BUILD_CACHE_LIFETIME", config.BuildCacheLifetime.PERSISTENT)
    d = config.cache_dir()
    assert os.path.isdir(d)
    assert d.endswith(config.CACHE_DIR_NAME)


def test_cache_dir_session(monkeypatch):
    monkeypatch.setattr(config, "BUILD_CACHE_LIFETIME", config.BuildCacheLifetime.SESSION)
    d = config.cache_dir()
    assert os.path.isdir(d)
    assert "session" in d
