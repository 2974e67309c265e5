from __future__ import annotations

from pyspark.sql import functions as F

from data_frame_spark.frame import Frame
from data_frame_spark.operators import window as W
from data_frame_spark.operators import lookup as L


def _ts_frame(spark):
    # smallframe-style fixture: sorted key, values (FIXTURES.md §2)
    return Frame.from_dict(
        spark,
        {
            "ts": [1.0, 2.0, 3.0, 4.0],
            "y": [10.0, 20.0, 30.0, 40.0],
        },
    ).set_sorted("ts")


def test_delta_and_cumulative(spark):
    fr = _ts_frame(spark)
    d = W.delta(fr.df, "y", order_by=["ts"])
    vals = [r["delta_y"] for r in d.orderBy("ts").collect()]
    assert vals == [None, 10.0, 10.0, 10.0]
    c = W.cumulative(fr.df, "y", order_by=["ts"])
    vals = [r["cum_y"] for r in c.orderBy("ts").collect()]
    assert vals == [10.0, 30.0, 60.0, 100.0]


def test_map_with_prev(spark):
    fr = _ts_frame(spark)
    out = W.map_with_prev(
        fr.df,
        "mid",
        lambda py, y: (py + y) / 2,
        ["y"],
        order_by=["ts"],
    )
    vals = [r["mid"] for r in out.orderBy("ts").collect()]
    assert vals == [None, 15.0, 25.0, 35.0]


def test_row_range(spark):
    fr = _ts_frame(spark)
    out = W.row_range(fr.df, ["ts"], start=1, stop=3)
    assert [r["ts"] for r in out.orderBy("ts").collect()] == [2.0, 3.0]


def test_asof_join_backward_forward(spark):
    base = _ts_frame(spark).df
    probes = spark.createDataFrame(
        [(0.5,), (2.0,), (2.5,), (9.0,)], ["ts"]
    )
    back = L.asof_join(probes, base, on="ts", value_cols=["y"])
    got = {r["ts"]: r["y"] for r in back.collect()}
    assert got == {0.5: None, 2.0: 20.0, 2.5: 20.0, 9.0: 40.0}
    fwd = L.asof_join(probes, base, on="ts", value_cols=["y"], direction="forward")
    got = {r["ts"]: r["y"] for r in fwd.collect()}
    assert got == {0.5: 10.0, 2.0: 20.0, 2.5: 30.0, 9.0: None}


def test_asof_strict(spark):
    base = _ts_frame(spark).df
    probes = spark.createDataFrame([(2.0,)], ["ts"])
    s = L.asof_join(probes, base, on="ts", value_cols=["y"], strict=True)
    assert s.collect()[0]["y"] == 10.0  # strictly before 2.0


def test_interpolated_lookup(spark):
    # df-test.rkt:765-782 expectation shape: lookup at 2.2 between
    # rows (2 -> 20, 3 -> 30) gives 22; clamps outside the range.
    base = _ts_frame(spark).df
    probes = spark.createDataFrame(
        [(2.2,), (1.0,), (0.2,), (11.0,)], ["ts"]
    )
    out = L.interpolated_lookup(probes, base, on="ts", value_cols=["y"])
    got = {r["ts"]: r["y"] for r in out.collect()}
    assert abs(got[2.2] - 22.0) < 1e-9
    assert got[1.0] == 10.0  # exact hit
    assert got[0.2] == 10.0  # clamp low
    assert got[11.0] == 40.0  # clamp high


def test_time_delay_series(spark):
    # tdelay fixture semantics (FIXTURES.md §6): y==i, ts=base+i so a
    # shift of +5 time units yields y+5 (forward lower-bound match).
    rows = [(i, float(i), 1_000_000 + i) for i in range(100)]
    df = spark.createDataFrame(rows, ["x", "y", "ts"])
    out = L.time_delay_series(df, "y", "ts", 5)
    got = {r["x"]: r["y_delayed"] for r in out.collect()}
    assert got[0] == 5.0 and got[50] == 55.0
    assert got[99] is None  # beyond the end -> unmatched
    # negative delay
    out2 = L.time_delay_series(df, "y", "ts", -5)
    got2 = {r["x"]: r["y_delayed"] for r in out2.collect()}
    assert got2[50] == 45.0 and got2[0] == 0.0


def test_asof_null_survival_no_tearing(spark):
    # The matched base row's columns must come from the SAME row, and a
    # NULL stored in that row must survive (df.rkt:474-507 returns the
    # found row including its NAs) — regression for the torn-row bug
    # where per-column last(ignorenulls) pulled v from an older row.
    base = spark.createDataFrame(
        [(10.0, 100.0, "A"), (20.0, None, "B")], ["k", "v", "tag"]
    )
    probes = spark.createDataFrame([(25.0,), (15.0,)], ["k"])
    out = L.asof_join(probes, base, on="k", value_cols=["v", "tag"])
    got = {r["k"]: (r["v"], r["tag"]) for r in out.collect()}
    assert got[25.0] == (None, "B")  # NULL survives, no tear to (100, B)
    assert got[15.0] == (100.0, "A")


def test_interpolated_lookup_null_bracket(spark):
    # a NULL value in a bracketing row propagates (no substitution of
    # an older row's value)
    base = spark.createDataFrame(
        [(1.0, 10.0), (2.0, None), (3.0, 30.0)], ["ts", "y"]
    )
    probes = spark.createDataFrame([(1.5,), (2.5,)], ["ts"])
    out = L.interpolated_lookup(probes, base, on="ts", value_cols=["y"])
    got = {r["ts"]: r["y"] for r in out.collect()}
    assert got[1.5] is None  # y1 is NULL -> interpolation is NULL
    assert got[2.5] is None  # y0 is NULL -> interpolation is NULL
