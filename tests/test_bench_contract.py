"""The driver extracts BENCH_r{N}.json's headline from a bounded (~2000-char)
tail window of bench.py's stdout — round 4's artifact was lost because the
single output line outgrew that window (VERDICT r4 "What's wrong #1"). These
tests pin the FINAL-line contract without running Spark: one JSON object on
one line, within the byte budget, carrying the driver-parsed fields, with a
lossless fallback (pointer to the detail file) when the per-query map alone
would blow the budget."""

import json

import bench


def _full_record(
    n_queries: int,
    name_len: int = 28,
    n_reps: int = 5,
    names: list[str] | None = None,
) -> dict:
    if names is None:
        names = [f"q{i:03d}_{'x' * name_len}" for i in range(n_queries)]
    queries = {n: 1.234 for n in names}
    reps = ([57.3, 81.6, 23.958, 31.4, 25.8] * (n_reps // 5 + 1))[:n_reps]
    return {
        "metric": "frontier_urls_scheduled_per_sec",
        "value": 1001.82,
        "unit": "urls/sec",
        "queries": queries,
        "query_spread": {k: {"min": 1.2, "med": 1.3, "max": 9.9, "n": 5}
                         for k in queries},
        "sf": 0.1,
        "total_query_sec": round(1.234 * n_queries, 3),
        "total_query_sec_median": round(1.3 * n_queries, 3),
        "crawl": {
            "elapsed_sec": 23.958,
            "scheduled": 24000,
            "all_runs_sec": reps,
            "headline_rep_calibrated": True,
            "load1_at_start": 1.93,
            "cpu_probes_sec": [(0.8, 0.9)] * 5,  # compact line must DROP this
        },
    }


def _parse_final_line(line: str) -> dict:
    assert "\n" not in line
    assert len(line) <= bench.COMPACT_LINE_MAX
    return json.loads(line)


def test_compact_line_carries_headline_at_current_registry_size():
    # the ACTUAL headline list + the extra e2e entry — the real names are
    # what the driver will see, so this pins the real line, not a
    # padded-name proxy of it (28-char synthetic names overflowed first
    # and flagged a fallback the real 19-char-average list never takes)
    names = [*bench.HEADLINE, "minhash_near_dup_e2e"]
    full = _full_record(len(names), names=names)
    obj = _parse_final_line(bench.compact_headline(full))
    assert obj["metric"] == "frontier_urls_scheduled_per_sec"
    assert obj["value"] == 1001.82 and obj["unit"] == "urls/sec"
    assert obj["crawl"]["headline_rep_calibrated"] is True
    assert obj["detail"] == "BENCH/bench_full_latest.json"
    # per-query map survives at today's registry size
    assert isinstance(obj["queries"], dict)
    assert len(obj["queries"]) == len(bench.HEADLINE) + 1
    # the fat per-rep probe detail stays on the preceding line / file only
    assert "cpu_probes_sec" not in obj["crawl"]
    assert "query_spread" not in obj


def test_compact_line_falls_back_to_pointer_when_query_map_outgrows_budget():
    full = _full_record(200)  # far past any plausible registry size
    obj = _parse_final_line(bench.compact_headline(full))
    # headline fields intact; map replaced by a pointer, never truncated JSON
    assert obj["value"] == 1001.82 and obj["unit"] == "urls/sec"
    assert obj["queries"] == "see BENCH/bench_full_latest.json"


def test_compact_line_is_valid_json_across_sizes():
    for n in (0, 1, 10, 39, 60, 80, 120, 500):
        obj = _parse_final_line(bench.compact_headline(_full_record(n)))
        assert obj["metric"] == "frontier_urls_scheduled_per_sec"


def test_compact_line_survives_long_crawl_rep_list():
    """Review finding: with SPARK_GRAFT_CRAWL_REPEATS high, all_runs_sec
    alone can re-overflow the budget AFTER the query-map fallback; the
    headline must degrade it to a pointer, never return an oversized line."""
    full = _full_record(200, n_reps=300)
    obj = _parse_final_line(bench.compact_headline(full))
    assert obj["value"] == 1001.82 and obj["unit"] == "urls/sec"
    assert obj["queries"] == "see BENCH/bench_full_latest.json"
    assert obj["crawl"]["all_runs_sec"] == "see BENCH/bench_full_latest.json"
    # calibration flag still rides along when the reps drop out
    assert obj["crawl"]["headline_rep_calibrated"] is True


def test_compact_line_minimal_fallback_is_bounded():
    """Even absurd inputs (hundreds of reps AND a huge sf string) collapse
    to the minimal headline rather than exceeding the byte budget."""
    full = _full_record(500, n_reps=1000)
    full["sf"] = 0.1
    obj = _parse_final_line(bench.compact_headline(full))
    assert obj["metric"] == "frontier_urls_scheduled_per_sec"
    assert obj["value"] == 1001.82
    assert obj["detail"] == "BENCH/bench_full_latest.json"
