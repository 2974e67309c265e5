from __future__ import annotations

import pytest
from pyspark.sql import types as T
from pyspark.sql import functions as F

from data_frame_spark.frame import Frame
from data_frame_spark.operators import stats as S
from data_frame_spark.operators import histogram as H
from data_frame_spark.operators import meanmax as MM
from data_frame_spark.operators import lookup as L
from data_frame_spark.operators import dedup as D


def _empty(spark, schema="x double, y double"):
    return spark.createDataFrame([], schema)


def test_quantiles_empty_input(spark):
    out = S.quantiles(_empty(spark), "x")
    assert out.count() == 0  # reference returns #f; we return no rows


def test_weighted_stats_empty_and_single_row(spark):
    assert S.weighted_stats(_empty(spark), "y", "x", order_by=["x"]).collect()[0][
        "weighted_mean"
    ] is None
    one = spark.createDataFrame([(1.0, 2.0)], ["x", "y"])
    row = S.weighted_stats(one, "y", "x", order_by=["x"]).collect()[0]
    assert row["weighted_mean"] is None  # no pairs -> no weight


def test_histogram_empty(spark):
    assert H.histogram(_empty(spark), "x").count() == 0


def test_mean_max_fewer_than_two_points(spark):
    one = spark.createDataFrame([(1.0, 2.0)], ["x", "y"])
    assert MM.mean_max(one, "y", "x", durations=[10]).count() == 0
    assert MM.mean_max(_empty(spark), "y", "x", durations=[10]).count() == 0


def test_asof_empty_base_gives_nulls(spark):
    probes = spark.createDataFrame([(1.0,), (2.0,)], "ts double")
    base = _empty(spark, "ts double, y double")
    out = L.asof_join(probes, base, on="ts", value_cols=["y"])
    assert [r["y"] for r in out.collect()] == [None, None]


def test_interpolated_all_null_values(spark):
    base = spark.createDataFrame(
        [(1.0, None), (2.0, None)], T.StructType([
            T.StructField("ts", T.DoubleType()),
            T.StructField("y", T.DoubleType()),
        ])
    )
    probes = spark.createDataFrame([(1.5,)], "ts double")
    out = L.interpolated_lookup(probes, base, on="ts", value_cols=["y"])
    assert out.collect()[0]["y"] is None


def test_minhash_empty_and_single_token_docs(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "word"), (3, "a b c d e")], ["doc_id", "text"]
    )
    sigs = D.minhash_signatures(docs, "text", "doc_id", num_hashes=4)
    assert sigs.count() == 3  # short docs still produce signatures


def test_histogram_single_value(spark):
    df = spark.createDataFrame([(7.0,)] * 10, ["x"])
    rows = H.histogram(df, "x", width=2.0).collect()
    assert len(rows) == 1 and rows[0]["bucket"] == 3 and rows[0]["count"] == 10


def test_frame_ref_out_of_range(spark):
    fr = Frame.from_dict(spark, {"a": [1, 2]}).set_sorted("a")
    with pytest.raises(IndexError):
        fr.ref(5)


def test_round11_operators_on_empty_input(spark):
    # empty DataFrames flow through the round-11 operators without
    # errors: funnel (no rows -> no step times), linkage (no pairs),
    # TCX serialize/parse (empty track round-trips to zero points)
    from data_frame_spark.operators.linkage import blocked_fuzzy_pairs
    from data_frame_spark.operators.window import funnel_steps
    from data_frame_spark.sources import tcx as TCX

    empty_ev = spark.createDataFrame([], "user_id long, event_type string, tsn long")
    assert (
        funnel_steps(empty_ev, ["view", "click"], "user_id", "event_type", "tsn")
        .count()
        == 0
    )
    empty_rec = spark.createDataFrame([], "id long, name string, blk string")
    assert blocked_fuzzy_pairs(empty_rec, "id", "name", ["blk"]).count() == 0
    xml = TCX.tcx_xml([])
    docs = spark.createDataFrame([(1, xml)], "source_id long, xml string")
    assert TCX.parse_many(docs, "xml").count() == 0
