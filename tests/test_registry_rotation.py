"""The driver certifies only the first 50 ``queries()`` entries per
round, so ordering must rotate automatically: least-recently-certified
first, derived from the CORRECTNESS_r*.json artifacts the driver writes
(VERDICT r04 "Next round" #1 — replaces the hand-frozen
_CERTIFIED_PRIOR_ROUNDS set)."""

from __future__ import annotations

import json

from nahuatl_data_pipeline_spark.registry import (
    certification_rounds,
    ordered_by_staleness,
    queries,
)


def _write(tmp_path, name, data):
    (tmp_path / name).write_text(json.dumps(data))


GREEN = {
    "rows_match": True,
    "schema_match": True,
    "hash_match": True,
    "spark_rows": 5,
    "oracle_rows": 5,
    "err": None,
}
RED = {
    "rows_match": False,
    "schema_match": True,
    "hash_match": False,
    "spark_rows": 5,
    "oracle_rows": 6,
    "err": None,
}
ERR = {
    "rows_match": None,
    "schema_match": None,
    "hash_match": None,
    "spark_rows": None,
    "oracle_rows": None,
    "err": "AnalysisException: boom",
}
ROWS_ONLY = {
    "rows_match": None,
    "schema_match": None,
    "hash_match": None,
    "spark_rows": 12,
    "oracle_rows": None,
    "err": "no_oracle",
}


def test_green_rows_take_newest_round(tmp_path):
    _write(tmp_path, "CORRECTNESS_r01.json", {"qA": GREEN, "qB": GREEN})
    _write(tmp_path, "CORRECTNESS_r02.json", {"qA": GREEN})
    assert certification_rounds(tmp_path) == {"qA": 2, "qB": 1}


def test_red_and_errored_rows_do_not_certify(tmp_path):
    _write(tmp_path, "CORRECTNESS_r01.json", {"qA": GREEN})
    _write(tmp_path, "CORRECTNESS_r02.json", {"qA": RED, "qC": ERR})
    rounds = certification_rounds(tmp_path)
    # qA's newest GREEN is r01 (the r02 red row doesn't refresh it);
    # qC never went green at all.
    assert rounds == {"qA": 1}


def test_rows_only_no_oracle_counts_as_certified(tmp_path):
    _write(tmp_path, "CORRECTNESS_r03.json", {"qS": ROWS_ONLY})
    assert certification_rounds(tmp_path) == {"qS": 3}


def test_rows_only_does_not_certify_query_that_now_has_oracle(tmp_path):
    """A query that gained a SQL oracle after a rows-only round must
    re-enter the driver's hash-check window (q64's r04 -> r05 path)."""
    _write(tmp_path, "CORRECTNESS_r04.json", {"qS": ROWS_ONLY, "qT": ROWS_ONLY})
    rounds = certification_rounds(tmp_path, oracles={"qS"})
    assert rounds == {"qT": 4}


def test_no_oracle_with_null_rows_does_not_certify(tmp_path):
    crashed = dict(ROWS_ONLY, spark_rows=None)
    _write(tmp_path, "CORRECTNESS_r03.json", {"qS": crashed})
    assert certification_rounds(tmp_path) == {}


def test_malformed_artifacts_are_skipped(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    _write(tmp_path, "CORRECTNESS_r02.json", ["not", "a", "dict"])
    _write(tmp_path, "CORRECTNESS_r03.json", {"qA": GREEN, "junk": "row"})
    assert certification_rounds(tmp_path) == {"qA": 3}


def test_round_numbers_above_nine_parse_numerically(tmp_path):
    _write(tmp_path, "CORRECTNESS_r09.json", {"qA": GREEN})
    _write(tmp_path, "CORRECTNESS_r10.json", {"qB": GREEN})
    assert certification_rounds(tmp_path) == {"qA": 9, "qB": 10}


def test_ordering_stalest_first_stable_within_round():
    rounds = {"q1": 2, "q2": 1, "q3": 1, "q5": 3}
    names = ["q1", "q2", "q3", "q4", "q5"]  # registration order
    # q4 never certified -> first; r1 pair keeps registration order.
    assert ordered_by_staleness(names, rounds) == [
        "q4", "q2", "q3", "q1", "q5",
    ]


def test_live_queries_order_matches_artifacts():
    """queries() on the real repo: no entry certified in a NEWER round
    may precede one certified in an older round (never = round 0) —
    after applying the semantics-change pins (_RECERTIFY_IF_BEFORE),
    which deliberately zero a query's effective round until the driver
    re-hashes its changed (plan, oracle) pair."""
    from nahuatl_data_pipeline_spark.registry import _RECERTIFY_IF_BEFORE

    rounds = certification_rounds()
    for name, changed_round in _RECERTIFY_IF_BEFORE.items():
        if rounds.get(name, 0) < changed_round:
            rounds.pop(name, None)
    seq = [rounds.get(n, 0) for n in queries()]
    assert seq == sorted(seq)
    assert len(seq) == len(set(queries())) and len(seq) >= 68


def test_recertify_pin_floats_changed_queries_to_front():
    """A semantics-changed query must occupy the driver's certification
    window even though it holds an (invalidated) older green row; the
    pin expires once a row at/after the change round exists."""
    from nahuatl_data_pipeline_spark.registry import _RECERTIFY_IF_BEFORE

    names = list(queries())
    rounds = certification_rounds()
    for name, changed_round in _RECERTIFY_IF_BEFORE.items():
        if rounds.get(name, 0) < changed_round:
            assert names.index(name) < 50, f"{name} fell out of the window"
