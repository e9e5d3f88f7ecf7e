"""Unit tests for the init-params disk cache (utils/testing.cached_init)."""

import dataclasses
import os

import numpy as np

from dreamvla_tpu.utils import testing


@dataclasses.dataclass
class _FakeCfg:
    width: int = 4


@dataclasses.dataclass
class _FakeModel:
    cfg: _FakeCfg


def _thunk_counter(calls, value):
    def thunk():
        calls.append(1)
        return {"w": np.full((4, 4), value, np.float32)}
    return thunk


def test_cache_hit_and_key_sensitivity(tmp_path, monkeypatch):
    monkeypatch.setattr(testing, "_PARAM_CACHE_DIR", str(tmp_path))
    model = _FakeModel(_FakeCfg())
    calls = []
    a = testing.cached_init(model, _thunk_counter(calls, 1.0), "sig-a")
    b = testing.cached_init(model, _thunk_counter(calls, 2.0), "sig-a")
    assert len(calls) == 1  # second call served from disk
    np.testing.assert_array_equal(a["w"], b["w"])
    # a different signature misses
    c = testing.cached_init(model, _thunk_counter(calls, 3.0), "sig-b")
    assert len(calls) == 2 and float(c["w"][0, 0]) == 3.0
    # a different config misses too
    d = testing.cached_init(_FakeModel(_FakeCfg(width=5)),
                            _thunk_counter(calls, 4.0), "sig-a")
    assert len(calls) == 3 and float(d["w"][0, 0]) == 4.0


def test_oversize_entries_stay_local(tmp_path, monkeypatch):
    monkeypatch.setattr(testing, "_PARAM_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("DREAMVLA_PARAM_CACHE_MAX", "64")
    model = _FakeModel(_FakeCfg())
    calls = []
    testing.cached_init(model, _thunk_counter(calls, 1.0), "big")
    names = os.listdir(tmp_path)
    assert len(names) == 1 and names[0].endswith(".local.pkl")
    # and still hits
    testing.cached_init(model, _thunk_counter(calls, 2.0), "big")
    assert len(calls) == 1


def test_disabled_without_cache_dir(monkeypatch):
    monkeypatch.setattr(testing, "_PARAM_CACHE_DIR", None)
    calls = []
    testing.cached_init(_FakeModel(_FakeCfg()), _thunk_counter(calls, 1.0),
                        "x")
    testing.cached_init(_FakeModel(_FakeCfg()), _thunk_counter(calls, 1.0),
                        "x")
    assert len(calls) == 2
