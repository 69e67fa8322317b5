"""Scaling-harness artifact contract (bench_scaling.py) — pure-Python, no
Spark.  Pins the review-found recovery-path hazards: the persistent window
history must tolerate reports written by OLDER harness versions (the exact
input the `rerender` subcommand exists to replay), re-rendering an
already-recorded window must not duplicate its history row, and the
probe-per-worker-count column must sort numerically (json round-trips dict
keys as strings, so "16" would otherwise sort before "2")."""

import json

import bench_scaling as bs


def _report(paired=(0.82,), low_sec=100.0, high_sec=30.5, probes=None):
    return {
        "n_docs": 1000,
        "low": {"cpus": 2, "elapsed_sec": low_sec, "n_urls": 10,
                "urls_per_sec": 1.0, "n_topk": 5},
        "high": {"cpus": 8, "elapsed_sec": high_sec, "n_urls": 10,
                 "urls_per_sec": 4.0, "n_topk": 5},
        "core_factor": 4.0,
        "speedup": 3.28,
        "scaling_efficiency": 0.82,
        "paired_efficiencies": list(paired),
        "paired_best": max(paired),
        "paired_median": sorted(paired)[len(paired) // 2],
        "quiet_load_gate": 1.0,
        "quiet_pairs": list(paired),
        "quiet_best": max(paired),
        "quiet_median": sorted(paired)[len(paired) // 2],
        "probe_tol": 1.25,
        "best_probe_sec_by_workers": probes if probes is not None else {2: 3.1, 8: 3.4},
        "calibrated_pairs": list(paired),
        "calibrated_best": max(paired),
        "calibrated_median": sorted(paired)[len(paired) // 2],
        "runs_low": [{"elapsed_sec": low_sec, "load1_at_start": 0.2,
                      "probe_before_sec": 3.1, "probe_after_sec": 3.2}],
        "runs_high": [{"elapsed_sec": high_sec, "load1_at_start": 0.3,
                       "probe_before_sec": 3.4, "probe_after_sec": 3.5}],
    }


def _use_tmp_history(tmp_path, monkeypatch):
    hist = tmp_path / "scaling_history.jsonl"
    monkeypatch.setattr(bs, "HIST_PATH", str(hist))
    return hist


def test_append_history_is_idempotent(tmp_path, monkeypatch):
    hist = _use_tmp_history(tmp_path, monkeypatch)
    r = _report()
    bs._append_history(r)
    bs._append_history(r)  # rerender on an already-recorded report
    # re-load through json (string keys) and replay once more — the shape
    # the rerender subcommand actually feeds in
    bs._append_history(json.loads(json.dumps(r)))
    rows = [json.loads(ln) for ln in hist.read_text().splitlines()]
    assert len(rows) == 1
    # a genuinely NEW window still appends
    bs._append_history(_report(paired=(0.79,), low_sec=101.0))
    rows = [json.loads(ln) for ln in hist.read_text().splitlines()]
    assert len(rows) == 2


def test_append_history_tolerates_old_harness_reports(tmp_path, monkeypatch):
    hist = _use_tmp_history(tmp_path, monkeypatch)
    old = _report()
    # pre-quiet/probe harness versions had none of these fields
    for k in ("quiet_pairs", "calibrated_pairs", "best_probe_sec_by_workers",
              "quiet_best", "quiet_median", "calibrated_best",
              "calibrated_median", "probe_tol", "quiet_load_gate"):
        old.pop(k)
    bs._append_history(old)  # must not KeyError
    (row,) = [json.loads(ln) for ln in hist.read_text().splitlines()]
    assert row["quiet"] == [] and row["calibrated"] == []
    # history renders (old rows lack keys there too) with no KeyError
    md = bs._history_md()
    assert "0.82" in md


def test_history_md_sorts_probe_keys_numerically(tmp_path, monkeypatch):
    _use_tmp_history(tmp_path, monkeypatch)
    bs._append_history(_report(probes={16: 3.0, 2: 3.1, 8: 3.2}))
    md = bs._history_md()
    line = next(ln for ln in md.splitlines() if "16w" in ln)
    assert line.index("2w") < line.index("8w") < line.index("16w")


def test_rerender_defaults_render_old_report(tmp_path, monkeypatch):
    """An older-harness report merged with the rerender defaults must render
    a full BASELINE.md without KeyError."""
    _use_tmp_history(tmp_path, monkeypatch)
    old = _report()
    for k in ("quiet_pairs", "calibrated_pairs", "best_probe_sec_by_workers",
              "quiet_best", "quiet_median", "calibrated_best",
              "calibrated_median", "probe_tol", "quiet_load_gate",
              "paired_best", "paired_median"):
        old.pop(k)
    defaults = {
        "paired_efficiencies": [], "paired_best": None, "paired_median": None,
        "quiet_load_gate": bs.QUIET_LOAD, "quiet_pairs": [],
        "quiet_best": None, "quiet_median": None, "probe_tol": bs.PROBE_TOL,
        "best_probe_sec_by_workers": {}, "calibrated_pairs": [],
        "calibrated_best": None, "calibrated_median": None,
    }
    md = bs._report_md({**defaults, **old})
    assert "local[2]" in md and "local[8]" in md
