"""BM25 ranked retrieval (operators/retrieval.py)."""

from __future__ import annotations

import math

import pytest

from data_frame_spark.operators.retrieval import bm25_rank


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_rare_term_matches_first(spark):
    # 'zebra' appears in one doc, 'the' in all: the zebra doc must
    # outrank pure 'the' matches for the query {zebra, the}
    docs = _mk(
        spark,
        [
            (1, "the cat sat on the mat"),
            (2, "the dog barked at the cat"),
            (3, "a zebra crossed the road"),
            (4, "cats and dogs and cats"),
        ],
    )
    out = bm25_rank(docs, "text", "doc_id", ["zebra", "the"], top_k=4).collect()
    assert out[0]["doc_id"] == 3
    # doc 4 has neither term -> excluded entirely
    assert {r["doc_id"] for r in out} == {1, 2, 3}


def test_bm25_matches_hand_computed_score(spark):
    docs = _mk(spark, [(1, "x y"), (2, "x x y y"), (3, "y y")])
    out = {r["doc_id"]: r["bm25_micro"] for r in
           bm25_rank(docs, "text", "doc_id", ["x"], top_k=3).collect()}
    # N=3, df=2, idf = ln(1 + (3-2+0.5)/(2+0.5)); avgdl = 8/3
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    for doc, tf, dl in ((1, 1, 2), (2, 2, 4)):
        raw = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (8.0 / 3.0)))
        assert out[doc] == math.floor(raw * 1e6 + 0.5)
    assert 3 not in out


def test_bm25_tf_saturation(spark):
    # k1 bounds the tf contribution: 100 repeats must score less
    # than (k1+1)x a single occurrence's idf
    docs = _mk(spark, [(1, " ".join(["q"] * 100)), (2, "q " + "z " * 99)])
    out = {r["doc_id"]: r["bm25"] for r in
           bm25_rank(docs, "text", "doc_id", ["q"], top_k=2).collect()}
    assert out[1] < 2.2 * out[2] / (2.2 / (1 + 1.2))  # loose saturation bound
    assert out[1] > out[2]  # but more occurrences still rank higher


def test_bm25_empty_query_rejected(spark):
    with pytest.raises(ValueError):
        bm25_rank(_mk(spark, [(1, "a")]), "text", "doc_id", [])
