"""Unit tests for bench.py's cross-round drift tracking (r10): history
persistence, previous-run resolution (history first, then the prior
BENCH_FULL.json as the seeding fallback), the >1.5x/>=0.5s flag rule,
and the isolated-to-isolated verdict baseline. No Spark involved — the
recheck subprocess path is disabled via SPARK_GRAFT_BENCH_NO_RECHECK so
the tests run in milliseconds."""

from __future__ import annotations

import importlib.util
import json
import os

import pytest


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def no_recheck(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_NO_RECHECK", "1")


def test_prev_run_prefers_history_then_bench_full(bench, tmp_path, no_recheck):
    d = str(tmp_path)
    assert bench._load_prev_run(d, 0.1) is None
    json.dump(
        {"sf": 0.1, "queries": {"a": 1.0}},
        open(os.path.join(d, "BENCH_FULL.json"), "w"),
    )
    assert bench._load_prev_run(d, 0.1) == {"a": 1.0}
    # a different sf must not seed
    assert bench._load_prev_run(d, 0.01) is None
    bench._record_history(d, 0.1, {"a": 2.0})
    assert bench._load_prev_run(d, 0.1) == {"a": 2.0}


def test_history_caps_at_12_runs(bench, tmp_path):
    d = str(tmp_path)
    for i in range(15):
        bench._record_history(d, 0.1, {"a": float(i)})
    runs = json.load(open(os.path.join(d, "BENCH_HISTORY.json")))["runs"]
    assert len(runs) == 12
    assert runs[-1]["queries"] == {"a": 14.0}


def test_drift_flag_rule(bench, tmp_path, no_recheck):
    d = str(tmp_path)
    prev = {"reg": 1.0, "imp": 2.0, "tiny": 0.1, "steady": 1.0}
    now = {"reg": 1.8, "imp": 0.9, "tiny": 0.3, "steady": 1.2, "new": 9.0}
    rep = bench._drift_check(prev, now, d, 0.1)
    by = {f["name"]: f for f in rep["flagged"]}
    # >1.5x both directions flag; sub-0.5s and steady and no-prev don't
    assert set(by) == {"reg", "imp"}
    assert by["reg"]["direction"] == "regression"
    assert by["imp"]["direction"] == "improvement"
    assert os.path.exists(os.path.join(d, "BENCH_DRIFT.json"))


def test_drift_verdict_uses_isolated_baseline(bench, tmp_path, monkeypatch):
    d = str(tmp_path)
    json.dump(
        {"sf": 0.1, "queries": {"q": 8.0}},
        open(os.path.join(d, "BENCH_ISOLATED.json"), "w"),
    )
    monkeypatch.delenv("SPARK_GRAFT_BENCH_NO_RECHECK", raising=False)
    calls = []

    def fake_min3(name):
        calls.append(name)
        return 9.0, None  # above in-suite prev*1.5, below isolated*1.5

    monkeypatch.setattr(bench, "_isolated_min3", fake_min3)
    rep = bench._drift_check({"q": 2.0}, {"q": 4.0}, d, 0.1)
    (f,) = rep["flagged"]
    assert calls == ["q"]
    # 9.0 <= 8.0 * 1.5: isolated-stable, NOT "real" — the verdict must
    # compare isolated-to-isolated, never fresh-JVM-to-warm-suite
    assert f["verdict"] == "isolated-stable"
    assert f["isolated_prev"] == 8.0

def test_recheck_wall_budget_bounds_the_bench(bench, tmp_path, monkeypatch):
    """A zero recheck budget must stop before the first recheck — the
    round driver times the whole bench invocation, so rechecks may never
    push it unboundedly past the suite's own wall time."""
    d = str(tmp_path)
    monkeypatch.delenv("SPARK_GRAFT_BENCH_NO_RECHECK", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RECHECK_BUDGET_S", "-1")
    calls = []
    monkeypatch.setattr(
        bench, "_isolated_min3", lambda n: calls.append(n) or (1.0, None)
    )
    rep = bench._drift_check({"q": 2.0}, {"q": 4.0}, d, 0.1)
    assert calls == []
    (f,) = rep["flagged"]
    assert f["isolated_err"] == "recheck budget exhausted"
    assert rep["rechecked"] == 0
