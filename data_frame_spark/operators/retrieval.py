"""Ranked text retrieval over a document corpus.

BM25 (Robertson & Walker, TREC-3 / the Lucene practical variant
with the non-negative idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``) as
a pure DataFrame pipeline — the "find me the docs about X" primitive
a training-data curation stack uses for targeted inspection,
benchmark leakage triage, and retrieval-based filtering.

Scale shape: the query's terms are a LITERAL list, so per-document
term frequencies become conditional aggregates in ONE map-combinable
``groupBy(doc)`` over the token stream — document length and every
tf in a single corpus shuffle, no per-term explode-join. All
corpus-level statistics the score needs (N, avgdl, per-term document
frequency) reduce to ONE aggregate row broadcast back, the scoring
itself is a narrow Column expression, and the final top-k plans as
TakeOrderedAndProject. Total: one data shuffle + one aggregate-sized
broadcast at any corpus size.

Exactness: per-(doc, term) partial scores are quantized to integer
micro-units (FLOOR(x * 1e6 + 0.5)) BEFORE the per-doc sum, so the
total is an exact integer independent of summation order — the same
recipe :func:`operators.sampling.temperature_weights` uses — and a
SQL oracle reproduces the ranking bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_frame_spark.operators.text import tokens


def bm25_rank(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Top-``top_k`` documents by BM25 score for ``query_terms``.

    Output: (id, bm25_micro, bm25) — ``bm25_micro`` is the exact
    integer micro-unit score (the ranking key), ``bm25`` its double
    rendering. Only docs matching at least one term are ranked; ties
    break by id, so the result set is deterministic.
    """
    if not query_terms:
        raise ValueError("bm25_rank needs at least one query term")
    terms = sorted({t.lower() for t in query_terms})

    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(F.col(text_col))).alias("__term"),
    )
    # ONE corpus shuffle: per-doc length + every query-term tf as
    # conditional aggregates (map-side combinable)
    perdoc = toks.groupBy("__id").agg(
        F.count(F.lit(1)).alias("__dl"),
        *[
            F.sum((F.col("__term") == F.lit(t)).cast("long")).alias(f"__tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    # corpus stats: N, avgdl, per-term df — ONE row, broadcast back
    stats = perdoc.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )

    def part(i: int) -> F.Column:
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col(f"__df{i}") + F.lit(0.5))
            / (F.col(f"__df{i}") + F.lit(0.5))
        )
        tfd = F.col(f"__tf{i}").cast("double")
        norm = tfd + F.lit(k1) * (
            F.lit(1.0 - b)
            + F.lit(b) * F.col("__dl").cast("double") / F.col("__avgdl")
        )
        raw = idf * tfd * F.lit(k1 + 1.0) / norm
        return F.floor(raw * F.lit(1e6) + F.lit(0.5)).cast("long")

    tf_cols = [F.col(f"__tf{i}") for i in range(len(terms))]
    matched = (tf_cols[0] if len(tf_cols) == 1 else F.greatest(*tf_cols)) > 0
    score = sum((part(i) for i in range(len(terms))), F.lit(0).cast("long"))
    return (
        perdoc.crossJoin(F.broadcast(stats))
        .where(matched)
        .select(F.col("__id"), score.alias("bm25_micro"))
        .orderBy(F.col("bm25_micro").desc(), F.col("__id"))
        .limit(top_k)
        .select(
            F.col("__id").alias(id_col),
            "bm25_micro",
            (F.col("bm25_micro").cast("double") / F.lit(1e6)).alias("bm25"),
        )
    )
