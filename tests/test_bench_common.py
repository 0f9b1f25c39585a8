"""Unit tests for bench._common — the shared resume-cache recorder and
best-of-2 timer every value study (cluster/pt/pa) builds on (review r4
finding 6 folded six copy-pasted closures into this module)."""

import json

from montecarlosolvers_tpu.bench._common import make_recorder


def test_recorder_runs_persists_and_caches(tmp_path):
    path = tmp_path / "summary.json"
    done = {}
    record = make_recorder(str(path), done)
    calls = []

    out = record("arm_a", lambda: calls.append("a") or {"eps": 0.02})
    assert out == {"eps": 0.02}
    assert calls == ["a"]
    # persisted after the arm completes, so an interrupt loses nothing
    assert json.loads(path.read_text()) == {"arm_a": {"eps": 0.02}}
    # cached names never re-run the (expensive) arm
    assert record("arm_a", lambda: calls.append("again")) == {"eps": 0.02}
    assert calls == ["a"]


def test_recorder_resumes_from_preloaded_done(tmp_path):
    path = tmp_path / "summary.json"
    done = {"arm_a": 1.5}  # as loaded from a previous interrupted run
    record = make_recorder(str(path), done)
    assert record("arm_a", lambda: (_ for _ in ()).throw(AssertionError)) == 1.5
    record("arm_b", lambda: 2.5)
    assert json.loads(path.read_text()) == {"arm_a": 1.5, "arm_b": 2.5}


def test_recorder_budget_skips_but_keeps_cache_hits(tmp_path, monkeypatch):
    import montecarlosolvers_tpu.bench._common as common

    t = [1000.0]
    monkeypatch.setattr(common.time, "time", lambda: t[0])
    path = tmp_path / "summary.json"
    done = {"cached": 7}
    record = make_recorder(str(path), done, budget_s=60.0)
    t[0] += 120.0  # budget exhausted
    # fresh arms are skipped (resume cache picks them up next invocation)
    assert record("fresh", lambda: 9) is None
    assert "fresh" not in done and not path.exists()
    # but already-done arms still return their value
    assert record("cached", lambda: 9) == 7
