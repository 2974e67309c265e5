from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_frame_spark.queries import t
from data_frame_spark.streaming import windows as W


@pytest.fixture(scope="module")
def batch_events(spark, sf_dir):
    return t(spark, sf_dir, "events")


def test_streaming_tumbling_matches_batch(spark, sf_dir, batch_events):
    stream = W.stream_events(spark, sf_dir)
    got = W.run_to_memory(W.tumbling_counts(stream), "t_tumbling")
    expect = W.tumbling_counts(batch_events)
    g = {(r["window_start"], r["event_type"]): (r["n"], round(r["value_sum"], 6)) for r in got.collect()}
    e = {(r["window_start"], r["event_type"]): (r["n"], round(r["value_sum"], 6)) for r in expect.collect()}
    assert g == e and len(g) > 0


def test_streaming_sliding_matches_batch(spark, sf_dir, batch_events):
    stream = W.stream_events(spark, sf_dir)
    got = W.run_to_memory(W.sliding_counts(stream), "t_sliding")
    expect = W.sliding_counts(batch_events)
    g = {r["window_start"]: r["n"] for r in got.collect()}
    e = {r["window_start"]: r["n"] for r in expect.collect()}
    assert g == e
    # each event in 4 windows (1h / 15min)
    assert sum(g.values()) == 4 * batch_events.count()


def test_streaming_session_matches_batch(spark, sf_dir, batch_events):
    stream = W.stream_events(spark, sf_dir)
    got = W.run_to_memory(W.session_counts(stream), "t_session")
    expect = W.session_counts(batch_events)
    g = {(r["session_start"], r["user_id"]): r["n"] for r in got.collect()}
    e = {(r["session_start"], r["user_id"]): r["n"] for r in expect.collect()}
    assert g == e and len(g) > 0
    # mass conservation
    assert sum(g.values()) == batch_events.count()


def test_streaming_dedup_matches_batch(spark, sf_dir, batch_events):
    from data_frame_spark.streaming import dedup as SD

    stream = W.stream_events(spark, sf_dir)
    got = W.run_to_memory(
        SD.exact_dedup_stream(stream.select("user_id", "ts"), ["user_id"]),
        "t_dedup",
        mode="append",
    )
    # one surviving row per user, same user set as batch distinct
    expect = {r["user_id"] for r in batch_events.select("user_id").distinct().collect()}
    rows = got.collect()
    assert {r["user_id"] for r in rows} == expect
    assert len(rows) == len(expect)


def test_streaming_content_dedup(spark):
    from data_frame_spark.streaming import dedup as SD

    rows = [
        (1, "The quick brown fox"),
        (2, "the  QUICK  brown fox"),  # same content after normalize
        (3, "something else entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = SD.content_dedup_stream(df).collect()
    assert len(out) == 2
    assert {r["text"] for r in out} != set()  # fp column dropped
    assert "__fp" not in SD.content_dedup_stream(df).columns
