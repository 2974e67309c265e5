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


def _brute_scd2(snapshot, updates):
    """Sequential reference: per key, sort versions by (ts, seg),
    drop rows equal to the surviving predecessor, effective-date."""
    byk = {}
    for k, seg in snapshot:
        byk.setdefault(k, []).append((0, seg))
    for k, seg, ts in updates:
        byk.setdefault(k, []).append((ts, seg))
    out = []
    for k, versions in byk.items():
        kept = []
        for ts, seg in sorted(versions):
            if not kept or kept[-1][1] != seg:
                kept.append((ts, seg))
        for i, (ts, seg) in enumerate(kept):
            nxt = kept[i + 1][0] if i + 1 < len(kept) else None
            out.append((k, seg, ts, nxt, nxt is None))
    return sorted(out)


def test_scd2_random_batches_match_brute(spark):
    import random

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=8, deadline=None, derandomize=True)
    @given(st.integers(0, 10_000))
    def go(seed):
        rng = random.Random(seed)
        keys = list(range(rng.randint(1, 6)))
        segs = ["A", "B", "C"]
        snapshot = [(k, rng.choice(segs)) for k in keys]
        updates = [
            (rng.choice(keys), rng.choice(segs), rng.randint(1, 8))
            for _ in range(rng.randint(0, 12))
        ]
        # scd2's total order is (ts, tracked): drop same-(key, ts)
        # duplicates with different segs, which the brute model (a
        # dict-of-lists sorted the same way) handles identically, but
        # keep exact duplicates to exercise the collapse
        got = _apply(spark, snapshot, updates)
        assert got == _brute_scd2(snapshot, updates), seed

    go()


def test_table_diff_classifies_and_drops_unchanged(spark):
    from data_frame_spark.operators.scd import table_diff

    old = spark.createDataFrame(
        [(1, "A", 10), (2, "B", None), (3, "C", 30), (4, "D", 40)],
        "k long, seg string, v long",
    )
    new = spark.createDataFrame(
        [(1, "A", 10),          # unchanged: no row
         (2, "B", None),        # NULL == NULL is unchanged (null-safe)
         (3, "X", 30),          # changed (seg)
         (5, "E", None)],       # added; 4 removed
        "k long, seg string, v long",
    )
    got = sorted(
        (r["k"], r["change"], r["old_seg"], r["new_seg"], r["old_v"], r["new_v"])
        for r in table_diff(old, new, ["k"], ["seg", "v"]).collect()
    )
    assert got == [
        (3, "changed", "C", "X", 30, 30),
        (4, "removed", "D", None, 40, None),
        (5, "added", None, "E", None, None),
    ]
    # NULL -> value on a compared column is a change, not noise
    new2 = spark.createDataFrame([(2, "B", 7)], "k long, seg string, v long")
    out2 = {
        r["k"]: r["change"]
        for r in table_diff(
            old.where("k = 2"), new2, ["k"], ["seg", "v"]
        ).collect()
    }
    assert out2 == {2: "changed"}

    import pytest

    with pytest.raises(ValueError, match="compare column"):
        table_diff(old, new, ["k"], [])
    with pytest.raises(ValueError, match="key column"):
        table_diff(old, new, [], ["seg"])


def test_scd2_rejects_null_and_noncastable_keys(spark):
    from data_frame_spark.operators.scd import scd2_apply

    snap = spark.createDataFrame([("CUST-001", "A")], "k string, seg string")
    ups = spark.createDataFrame([("CUST-001", "B", 5)], "k string, seg string, ts long")
    with pytest.raises(Exception, match="do not cast to long"):
        scd2_apply(snap, ups, "k", ["seg"], "ts").collect()
    snap2 = spark.createDataFrame([(1, "A")], "k long, seg string")
    ups2 = spark.createDataFrame([(1, "B", None)], "k long, seg string, ts long")
    with pytest.raises(Exception, match="do not cast to long"):
        scd2_apply(snap2, ups2, "k", ["seg"], "ts").collect()


def _brute_diff(old_rows, new_rows):
    o = {k: (seg, v) for k, seg, v in old_rows}
    n = {k: (seg, v) for k, seg, v in new_rows}
    out = []
    for k in set(o) | set(n):
        if k not in o:
            out.append((k, "added", None, n[k][0], None, n[k][1]))
        elif k not in n:
            out.append((k, "removed", o[k][0], None, o[k][1], None))
        elif o[k] != n[k]:
            out.append((k, "changed", o[k][0], n[k][0], o[k][1], n[k][1]))
    return sorted(out, key=lambda r: r[0])


def test_table_diff_random_snapshots_match_brute(spark):
    import random

    from hypothesis import given, settings, strategies as st

    from data_frame_spark.operators.scd import table_diff

    @settings(max_examples=8, deadline=None, derandomize=True)
    @given(st.integers(0, 10_000))
    def go(seed):
        rng = random.Random(seed)

        def snap():
            return [
                (k, rng.choice(["A", "B", None]), rng.choice([1, 2, None]))
                for k in rng.sample(range(10), rng.randint(0, 8))
            ]

        old_rows, new_rows = snap(), snap()
        old = spark.createDataFrame(old_rows, "k long, seg string, v long") \
            if old_rows else spark.createDataFrame([], "k long, seg string, v long")
        new = spark.createDataFrame(new_rows, "k long, seg string, v long") \
            if new_rows else spark.createDataFrame([], "k long, seg string, v long")
        got = sorted(
            (
                (r["k"], r["change"], r["old_seg"], r["new_seg"],
                 r["old_v"], r["new_v"])
                for r in table_diff(old, new, ["k"], ["seg", "v"]).collect()
            ),
            key=lambda r: r[0],
        )
        assert got == _brute_diff(old_rows, new_rows), seed

    go()


def test_merge_upsert_update_insert_delete(spark):
    from data_frame_spark.operators.scd import merge_upsert

    target = spark.createDataFrame(
        [(1, "A", 10), (2, "B", 20), (3, "C", 30)],
        "k long, seg string, extra long",
    )
    source = spark.createDataFrame(
        [(2, "B2", False), (4, "D", False), (3, None, True)],
        "k long, seg string, del boolean",
    )
    got = sorted(
        (r["k"], r["seg"], r["extra"])
        for r in merge_upsert(target, source, ["k"], ["seg"], "del").collect()
    )
    # 1 untouched; 2 overwritten; 3 deleted; 4 inserted (extra NULL)
    assert got == [(1, "A", 10), (2, "B2", 20), (4, "D", None)]


def test_merge_upsert_null_overwrites_and_unmatched_delete_noop(spark):
    from data_frame_spark.operators.scd import merge_upsert

    target = spark.createDataFrame([(1, "A")], "k long, seg string")
    source = spark.createDataFrame(
        [(1, None, False), (9, "X", True)], "k long, seg string, del boolean"
    )
    got = [
        (r["k"], r["seg"])
        for r in merge_upsert(target, source, ["k"], ["seg"], "del").collect()
    ]
    # SET seg = s.seg overwrites with NULL; the unmatched delete (9)
    # inserts nothing
    assert got == [(1, None)]


def test_merge_upsert_duplicate_source_key_raises(spark):
    import pytest

    from data_frame_spark.operators.scd import merge_upsert

    target = spark.createDataFrame([(1, "A")], "k long, seg string")
    dup = spark.createDataFrame(
        [(1, "X"), (1, "Y")], "k long, seg string"
    )
    with pytest.raises(Exception, match="cardinality violation"):
        merge_upsert(target, dup, ["k"], ["seg"]).collect()


def test_merge_upsert_guards_and_no_delete_col(spark):
    import pytest

    from data_frame_spark.operators.scd import merge_upsert

    target = spark.createDataFrame([(1, "A")], "k long, seg string")
    source = spark.createDataFrame([(2, "B")], "k long, seg string")
    with pytest.raises(ValueError, match="key column"):
        merge_upsert(target, source, [], ["seg"])
    with pytest.raises(ValueError, match="update column"):
        merge_upsert(target, source, ["k"], [])
    got = sorted(
        (r["k"], r["seg"])
        for r in merge_upsert(target, source, ["k"], ["seg"]).collect()
    )
    assert got == [(1, "A"), (2, "B")]


def test_merge_upsert_matches_brute_randomized(spark):
    # randomized NULL-bearing batches vs a dict-based brute model —
    # overlapping keys, NULL overwrites, delete flags, pass-through
    # columns on inserts (the table_diff property-test recipe)
    import random

    from hypothesis import given, settings, strategies as st

    from data_frame_spark.operators.scd import merge_upsert

    @settings(max_examples=8, deadline=None, derandomize=True)
    @given(st.integers(0, 10_000))
    def go(seed):
        rng = random.Random(seed)
        tgt_rows = [
            (k, rng.choice(["A", "B", None]), rng.choice([10, 20, None]))
            for k in rng.sample(range(12), rng.randint(0, 9))
        ]
        src_keys = rng.sample(range(12), rng.randint(0, 9))
        src_rows = [
            (k, rng.choice(["X", "Y", None]), rng.random() < 0.3)
            for k in src_keys  # distinct keys: the cardinality contract
        ]
        schema_t = "k long, seg string, extra long"
        target = (
            spark.createDataFrame(tgt_rows, schema_t)
            if tgt_rows else spark.createDataFrame([], schema_t)
        )
        schema_s = "k long, seg string, del boolean"
        source = (
            spark.createDataFrame(src_rows, schema_s)
            if src_rows else spark.createDataFrame([], schema_s)
        )
        got = sorted(
            (r["k"], r["seg"], r["extra"])
            for r in merge_upsert(
                target, source, ["k"], ["seg"], "del"
            ).collect()
        )
        # brute: dict of target rows, apply source in any order
        # (keys distinct so order is irrelevant)
        state = {k: (seg, extra) for k, seg, extra in tgt_rows}
        for k, seg, dele in src_rows:
            if dele:
                state.pop(k, None)
            elif k in state:
                state[k] = (seg, state[k][1])
            else:
                state[k] = (seg, None)
        want = sorted((k, seg, extra) for k, (seg, extra) in state.items())
        assert got == want, seed

    go()


def test_merge_upsert_composite_keys(spark):
    from data_frame_spark.operators.scd import merge_upsert

    target = spark.createDataFrame(
        [(1, "x", "A"), (1, "y", "B"), (2, "x", "C")],
        "k1 long, k2 string, seg string",
    )
    source = spark.createDataFrame(
        [(1, "y", "B2", False), (2, "y", "D", False), (1, "x", None, True)],
        "k1 long, k2 string, seg string, del boolean",
    )
    got = sorted(
        (r["k1"], r["k2"], r["seg"])
        for r in merge_upsert(
            target, source, ["k1", "k2"], ["seg"], "del"
        ).collect()
    )
    # (1,x) deleted; (1,y) overwritten; (2,x) untouched; (2,y) inserted
    assert got == [(1, "y", "B2"), (2, "x", "C"), (2, "y", "D")]
    # duplicate COMPOSITE key still raises (same k1, same k2)
    import pytest

    dup = spark.createDataFrame(
        [(1, "y", "P"), (1, "y", "Q")], "k1 long, k2 string, seg string"
    )
    with pytest.raises(Exception, match="cardinality violation"):
        merge_upsert(target, dup, ["k1", "k2"], ["seg"]).collect()
