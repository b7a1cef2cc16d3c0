"""bench.py backend-retry: a transient UNAVAILABLE tunnel must re-exec,
a hard outage must still fail loudly (NOTES.md round 3: the axon tunnel
was observed down for a whole service session)."""

import os

import pytest

import bench


def test_await_backend_noop_when_probe_succeeds(monkeypatch):
    monkeypatch.delenv("BENCH_BACKEND_TRIES", raising=False)
    called = {"execv": 0}
    monkeypatch.setattr(os, "execv",
                        lambda *a: called.__setitem__("execv", 1))
    bench._await_backend(_probe=lambda: None)
    assert called["execv"] == 0


def test_await_backend_reexecs_on_failure(monkeypatch):
    monkeypatch.delenv("BENCH_BACKEND_TRIES", raising=False)
    calls = {}

    def fake_execv(exe, argv):
        calls["argv"] = argv
        raise SystemExit(0)  # stop the test here instead of replacing it

    monkeypatch.setattr(os, "execv", fake_execv)
    monkeypatch.setattr(bench.time, "sleep", lambda s: calls.setdefault(
        "slept", s))

    def probe():
        raise RuntimeError("UNAVAILABLE: TPU backend setup/compile error")

    with pytest.raises(SystemExit):
        bench._await_backend(sleep_s=1.0, _probe=probe)
    assert os.environ["BENCH_BACKEND_TRIES"] == "1"
    assert calls["slept"] == 1.0
    del os.environ["BENCH_BACKEND_TRIES"]


def test_await_backend_gives_up_after_budget(monkeypatch):
    monkeypatch.setenv("BENCH_BACKEND_TRIES", "3")
    monkeypatch.setattr(os, "execv", lambda *a: pytest.fail(
        "must not re-exec past the retry budget"))

    def probe():
        raise RuntimeError("UNAVAILABLE")

    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        bench._await_backend(max_tries=4, _probe=probe)
