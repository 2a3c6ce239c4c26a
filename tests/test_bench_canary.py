"""The bench contention canary (bench.py:_canary_contention) — the r5
failure mode was a sweep recorded in a host-steal band whose JSON read
standalone as a 50% regression. The canary makes every emitted sweep
self-describing: pipeline time > 1.3x the best recorded for the same
shape => {"contended": true} plus the ratio. Pure-Python tests (no
Spark session)."""

import json
import sys


def _fresh_bench(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(bench, "_BEST_FILE", str(tmp_path / "best.json"))
    return bench


def test_canary_first_run_records_best_and_is_unflagged(tmp_path, monkeypatch):
    bench = _fresh_bench(tmp_path, monkeypatch)
    contended, info = bench._canary_contention(0.1, None, 8, 3.0)
    assert contended is False and info["best_recorded_sec"] is None
    best = json.load(open(tmp_path / "best.json"))
    assert best == {"pipeline|sf=0.1|n=all|cpus=8": 3.0}


def test_canary_flags_contended_sweep_and_keeps_best(tmp_path, monkeypatch):
    bench = _fresh_bench(tmp_path, monkeypatch)
    bench._canary_contention(0.1, None, 8, 3.0)
    # 4.5s > 1.3 * 3.0 -> contended; the best must NOT ratchet upward
    contended, info = bench._canary_contention(0.1, None, 8, 4.5)
    assert contended is True
    assert info["ratio"] == 1.5 and info["best_recorded_sec"] == 3.0
    assert json.load(open(tmp_path / "best.json")) == {
        "pipeline|sf=0.1|n=all|cpus=8": 3.0
    }
    # within threshold -> not contended
    contended, _ = bench._canary_contention(0.1, None, 8, 3.8)
    assert contended is False
    # a faster run ratchets the reference tighter
    contended, _ = bench._canary_contention(0.1, None, 8, 2.5)
    assert contended is False
    assert json.load(open(tmp_path / "best.json")) == {
        "pipeline|sf=0.1|n=all|cpus=8": 2.5
    }


def test_canary_keys_separate_shapes(tmp_path, monkeypatch):
    """Different (sf, n_pages, cpus) shapes must never share a reference —
    a slow sf0.1 sweep compared against an sf0.01 best would always flag."""
    bench = _fresh_bench(tmp_path, monkeypatch)
    bench._canary_contention(0.01, None, 8, 0.5)
    contended, info = bench._canary_contention(0.1, 240000, 32, 10.0)
    assert contended is False and info["best_recorded_sec"] is None
    best = json.load(open(tmp_path / "best.json"))
    assert set(best) == {
        "pipeline|sf=0.01|n=all|cpus=8",
        "pipeline|sf=0.1|n=240000|cpus=32",
    }
