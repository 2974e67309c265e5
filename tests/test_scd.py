"""scd2_apply semantics on hand fixtures (the oracle parity lives in
tests/test_oracle_prep.py)."""

from __future__ import annotations

import pytest

from data_frame_spark.operators.scd import scd2_apply


def _apply(spark, snapshot_rows, update_rows):
    snap = spark.createDataFrame(snapshot_rows, "k long, seg string")
    ups = spark.createDataFrame(update_rows, "k long, seg string, ts long")
    out = scd2_apply(snap, ups, "k", ["seg"], "ts")
    return sorted(
        (r["k"], r["seg"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    )


def test_scd2_change_collapse_and_effective_dating(spark):
    got = _apply(
        spark,
        [(1, "A"), (2, "B")],
        [
            (1, "A", 10),   # no-op update: collapses into the baseline
            (1, "C", 20),   # real change
            (1, "C", 30),   # no-op again
            (1, "A", 40),   # change BACK still versions (prev-only compare)
            # key 2 never updates: single current baseline row
        ],
    )
    assert got == [
        (1, "A", 0, 20, False),
        (1, "A", 40, None, True),
        (1, "C", 20, 40, False),
        (2, "B", 0, None, True),
    ]


def test_scd2_same_ts_ties_are_deterministic_and_layout_free(spark):
    ups = [(1, "Z", 10), (1, "M", 10), (1, "A", 10)]  # tie on ts
    got = _apply(spark, [(1, "A")], ups)
    # total order (ts, seg): A(0) -> A@10 collapses -> M@10 -> Z@10
    assert got == [
        (1, "A", 0, 10, False),
        (1, "M", 10, 10, False),
        (1, "Z", 10, None, True),
    ]
    snap = spark.createDataFrame([(1, "A")], "k long, seg string")
    df = spark.createDataFrame(ups, "k long, seg string, ts long")
    again = sorted(
        (r["k"], r["seg"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_apply(snap.repartition(3), df.repartition(5), "k", ["seg"], "ts").collect()
    )
    assert again == got


def test_scd2_requires_tracked_columns(spark):
    snap = spark.createDataFrame([(1, "A")], "k long, seg string")
    ups = spark.createDataFrame([(1, "B", 5)], "k long, seg string, ts long")
    with pytest.raises(ValueError, match="tracked column"):
        scd2_apply(snap, ups, "k", [], "ts")
