"""Bench contamination detectors (round-12 VERDICT ask #4 + ADVICE #1).

Drives the PRODUCTION detector functions in bench.py with a synthetic
CPU burst — a load source that starts and subsides INSIDE one sentinel
segment, the exact scenario the bracket detector is blind to by
construction — and asserts the floor-relative guard catches it, retries
through it, and keeps the flag up when the load never subsides.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def test_sentinel_blind_to_intra_segment_burst_floor_guard_catches():
    """The documented blindness: a burst contained between two sentinel
    samples leaves both brackets clean (no sentinel flag) while the
    queries measured during it run hot — only the floor-relative guard
    sees that."""
    # segment 0 holds q_a/q_b; both bracket samples (cal[0], cal[1]) are
    # idle-clean because the burst started after cal[0] and ended before
    # cal[1]
    cal = [0.3, 0.3, 0.3]
    seg_of = {"q_a": 0, "q_b": 0, "q_c": 1}
    base = min(sorted(cal)[len(cal) // 2], 0.45)
    assert bench.contaminated_segments(cal, seg_of, base) == set()

    floors = {"q_a": 1.0, "q_b": 2.0, "q_c": 1.0}
    timings = {"q_a": 3.1, "q_b": 2.2, "q_c": 1.0}  # burst hit q_a hard
    assert bench.over_floor(timings, floors) == {"q_a"}


def test_floor_retry_recovers_when_burst_subsides():
    """Synthetic load through the production retry path: the first two
    re-timings still run under the burst, the third lands clean — the
    flag must clear and the timing must settle on the clean sample."""
    burst = iter([3.0, 2.9, 1.0])  # load subsides on the 3rd retry

    def retime(name: str) -> float:
        return next(burst)

    timings = {"q_hot": 3.2}
    flagged = bench.floor_retry_pass(timings, {"q_hot": 1.0}, retime)
    assert flagged == set()
    assert timings["q_hot"] == 1.0


def test_floor_retry_keeps_flag_under_persistent_load_or_regression():
    """A burst that never subsides (or a genuine plan regression) must
    stay machine-readable after the bounded retries — an upper-bound
    claim, never silently swallowed."""
    calls = []

    def retime(name: str) -> float:
        calls.append(name)
        return 3.0

    timings = {"q_hot": 3.2, "q_ok": 0.9}
    flagged = bench.floor_retry_pass(timings, {"q_hot": 1.0, "q_ok": 1.0}, retime)
    assert flagged == {"q_hot"}
    assert len(calls) == bench._CONTAM_RETRIES  # bounded
    assert timings["q_ok"] == 0.9  # clean queries never re-timed


def test_idle_ceiling_clamped_against_loaded_startup():
    """r12 ADVICE #1: a host already loaded at bench start inflates every
    startup sample; the ceiling must not follow them up unboundedly,
    or whole-run contamination becomes unflaggable."""
    idle = bench._CAL_IDLE_SEC
    # clean startup: best sample under the pinned bound keeps the bound
    assert bench.idle_ceiling_from([0.2, 0.3, 0.25]) == idle
    # moderately slower hardware: auto-adjusts to the best sample
    assert bench.idle_ceiling_from([0.9, 1.1, 0.8]) == 0.8
    # fully loaded startup: clamped to the small multiple, NOT 5.0
    assert (
        bench.idle_ceiling_from([5.0, 4.8, 5.2])
        == bench._CAL_CEIL_CLAMP * idle
    )
    # one clean scheduling slot among loaded samples wins (min-of-N)
    assert bench.idle_ceiling_from([5.0, 0.3, 5.2]) == idle


def test_whole_run_contamination_flaggable_with_clamped_ceiling():
    """The scenario the clamp exists for: every sentinel sample inflated
    together (r10: loadavg ~10 for the entire run).  With the old
    one-sample ceiling the cut tracked the load and nothing flagged;
    with the clamp, samples beyond _CONTAM_RATIO × clamp × idle flag."""
    cal = [3.0, 3.1, 2.9, 3.0]  # whole run under heavy load
    seg_of = {"q_a": 0, "q_b": 1, "q_c": 2}
    ceiling = bench.idle_ceiling_from(cal[:3])  # loaded startup too
    base = min(sorted(cal)[len(cal) // 2], ceiling)
    flagged = bench.contaminated_segments(cal, seg_of, base)
    assert flagged == {"q_a", "q_b", "q_c"}


def test_load_floor_record_reads_committed_bench_local():
    """bench.py must read per-query floors from the committed
    BENCH_LOCAL.json (the single authoritative floor record BASELINE.md
    points to) and only at the matching SF."""
    path = Path(bench.__file__).resolve().parent / "BENCH_LOCAL.json"
    rec = json.loads(path.read_text())
    floors = bench.load_floor_record(rec["sf"])
    assert floors == rec["queries"]
    assert len(floors) > 50
    # sf mismatch → no floors → the guard stands down rather than
    # comparing apples to oranges
    assert bench.load_floor_record("0.000001-nonexistent") == {}


def test_load_floor_record_falls_back_to_sf_sibling(tmp_path):
    """r13 ADVICE #2: when the committed record was captured at a
    different SF, the floor guard must read the sf-suffixed sibling that
    floor_safe_out_path diverts non-primary-SF runs to — otherwise the
    guard is silently inert (n_floors_compared=0) at that SF."""
    base = str(tmp_path / "BENCH_LOCAL.json")
    with open(base, "w") as fh:
        json.dump({"sf": 0.1, "queries": {"a": 1.0}}, fh)
    with open(str(tmp_path / "BENCH_LOCAL_sf0.01.json"), "w") as fh:
        json.dump({"sf": 0.01, "queries": {"a": 0.2, "b": 0.3}}, fh)
    assert bench.load_floor_record(0.1, base=base) == {"a": 1.0}
    assert bench.load_floor_record(0.01, base=base) == {"a": 0.2, "b": 0.3}
    assert bench.load_floor_record(0.001, base=base) == {}


def test_merge_floor_record_recomputes_headline_value(tmp_path):
    """r13 ADVICE #3: after a min-merge the record's top-level value must
    equal sum(queries) — keeping the new run's headline total next to
    min-merged floors made the committed record internally inconsistent."""
    from bench import merge_floor_record

    p = str(tmp_path / "BENCH_LOCAL.json")
    with open(p, "w") as fh:
        json.dump({"sf": 0.1, "queries": {"a": 1.5, "b": 3.0}, "value": 4.5}, fh)
    m = merge_floor_record(p, {"sf": 0.1, "queries": {"a": 2.0, "b": 1.0}, "value": 3.0})
    assert m["queries"] == {"a": 1.5, "b": 1.0}
    assert m["value"] == 2.5


def test_floor_record_protected_from_other_sf_runs(tmp_path):
    """A quick iteration run at a different SF must not clobber the
    committed sf0.1 floor record — it diverts to an sf-suffixed sibling;
    same-SF refreshes and first writes stay in place (round 13)."""
    import json

    from bench import floor_safe_out_path

    p = str(tmp_path / "BENCH_LOCAL.json")
    assert floor_safe_out_path(p, 0.01) == p  # first write
    with open(p, "w") as fh:
        json.dump({"sf": 0.1}, fh)
    assert floor_safe_out_path(p, 0.01) == str(
        tmp_path / "BENCH_LOCAL_sf0.01.json"
    )
    assert floor_safe_out_path(p, 0.1) == p  # same-SF refresh


def test_merge_floor_record_ratchets_down_only(tmp_path):
    """Floors min-merge across same-SF runs (a slower host must never
    LOOSEN the record); new queries enter at their first value, dropped
    ones age out, different-SF or missing records pass through."""
    import json

    from bench import merge_floor_record

    p = str(tmp_path / "BENCH_LOCAL.json")
    run = {"sf": 0.1, "queries": {"a": 2.0, "b": 1.0, "new": 5.0}}
    # no existing record → pass-through (no floor_merged flag)
    assert merge_floor_record(p, run) == run
    with open(p, "w") as fh:
        json.dump({"sf": 0.1, "queries": {"a": 1.5, "b": 3.0, "gone": 9.9}}, fh)
    m = merge_floor_record(p, run)
    assert m["queries"] == {"a": 1.5, "b": 1.0, "new": 5.0}
    assert m["floor_merged"] is True
    # different SF → pass-through untouched
    with open(p, "w") as fh:
        json.dump({"sf": 0.01, "queries": {"a": 0.1}}, fh)
    assert merge_floor_record(p, run) == run


def test_write_floor_record_merges_before_truncating(tmp_path):
    """Regression (round-13 review): the merge must read the committed
    record BEFORE open('w') truncates it — merging after the open sees
    an empty file and silently degrades to last-run-wins.  This drives
    the real write path main() uses."""
    import json

    from bench import write_floor_record

    p = str(tmp_path / "BENCH_LOCAL.json")
    with open(p, "w") as fh:
        json.dump({"sf": 0.1, "queries": {"a": 1.0}}, fh)
    write_floor_record(p, {"sf": 0.1, "queries": {"a": 2.0, "b": 0.5}})
    rec = json.load(open(p))
    assert rec["queries"] == {"a": 1.0, "b": 0.5}
    assert rec["floor_merged"] is True


def test_chunked_query_lines_fit_budget_and_reassemble():
    """Round-15 VERDICT #2: the per-query map re-emitted as chunk lines —
    every line a complete JSON object within the chunk budget, chunks
    reassembling to the exact map, fullest chunks printed last so the
    most entries sit whole inside the driver's 2000-char tail window."""
    timings = {f"query_name_{i:02d}_{'x' * (i % 7)}": round(0.1 * i, 3) for i in range(79)}
    lines = bench.chunked_query_lines(timings, 0.1)
    assert all(len(ln) <= bench._CHUNK_BUDGET for ln in lines)
    got: dict = {}
    parts = set()
    for ln in lines:
        d = json.loads(ln)
        assert d["metric"] == "headline_queries_per_query"
        assert d["sf"] == 0.1
        parts.add((d["part"], d["of"]))
        got.update(d["queries"])
    assert got == timings
    assert {p for p, _ in parts} == set(range(1, len(lines) + 1))
    # ascending-size print order: the tail window sees the fullest chunks
    assert [len(ln) for ln in lines] == sorted(len(ln) for ln in lines)
    # the guaranteed-parse contract: last two chunks + a ~200-char short
    # line fit the measured 2000-char driver tail window
    assert sum(len(ln) + 1 for ln in lines[-2:]) + 200 <= bench._TAIL_BUDGET


def test_chunked_query_lines_single_oversized_entry_kept():
    """A single entry longer than the budget still gets its own line —
    truncation would silently drop a query from the emitted map."""
    timings = {"q" * 900: 1.0, "small": 0.1}
    lines = bench.chunked_query_lines(timings, 0.1)
    got: dict = {}
    for ln in lines:
        got.update(json.loads(ln)["queries"])
    assert got == timings


def test_reset_floors_named_and_all():
    """Round-15 VERDICT #10: the documented floor-reset path drops named
    entries (or all) and recomputes the headline value; unknown names
    are ignored."""
    rec = {"sf": 0.1, "queries": {"a": 1.0, "b": 2.0, "c": 3.0}, "value": 6.0}
    out = bench.reset_floors(rec, "b, nosuch")
    assert out["queries"] == {"a": 1.0, "c": 3.0} and out["value"] == 4.0
    assert rec["queries"] == {"a": 1.0, "b": 2.0, "c": 3.0}  # input untouched
    assert bench.reset_floors(rec, "all")["queries"] == {}
    assert bench.reset_floors(rec, " ") is rec


def test_merge_floor_record_annotates_contributing_cpus(tmp_path):
    """Floor lifecycle (round-15 VERDICT #10): floors stay config-agnostic
    minima, but every contributing core count is recorded in floor_cpus."""
    p = tmp_path / "BENCH_LOCAL.json"
    old = {"sf": 0.1, "queries": {"a": 1.0}, "value": 1.0, "cpus": 32}
    p.write_text(json.dumps(old))
    new = {"sf": 0.1, "queries": {"a": 0.9}, "value": 0.9, "cpus": 8}
    merged = bench.merge_floor_record(str(p), new)
    assert merged["queries"] == {"a": 0.9}
    assert merged["floor_cpus"] == [8, 32]
    # a third run folds in, preserving the accumulated set
    p.write_text(json.dumps(merged))
    third = {"sf": 0.1, "queries": {"a": 1.1}, "value": 1.1, "cpus": 16}
    again = bench.merge_floor_record(str(p), third)
    assert again["queries"] == {"a": 0.9}
    assert again["floor_cpus"] == [8, 16, 32]
