"""Streaming deduplication — the ingest-side twin of
:mod:`operators.dedup` (north-star extension; the reference has no
streaming).

A training-data landing pipeline dedups AT INGEST so duplicates
never reach storage. Spark's ``dropDuplicatesWithinWatermark``
keeps one row per key and bounds the dedup state by the event-time
watermark: a key's state is dropped once the watermark passes it,
so state size is proportional to the watermark window, not the
stream's lifetime — the only formulation that survives an unbounded
stream.

Batch parity: on a batch DataFrame the same transformations
degrade to ``dropDuplicates`` (no watermark concept; results are
identical because batch sees all data at once) — tests assert
stream == batch.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_frame_spark.operators.dedup import MINHASH_P, minhash_params
from data_frame_spark.operators.text import normalize, word_shingles

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def stream_documents(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming source over the documents parquet (in production:
    the landing queue). The corpus carries no arrival time, so a
    deterministic synthetic ingest timestamp (epoch + doc_id seconds)
    stands in — batch twins derive the identical column, keeping
    stream-vs-batch tests exact."""
    raw = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
    return raw.withColumn(
        "ts", F.timestamp_seconds(F.col("doc_id"))
    ).withWatermark("ts", watermark)


def exact_dedup_stream(
    events: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Keep the first row per key. On a streaming DataFrame (which
    must already carry a watermark — :func:`windows.stream_events`
    applies one) state is watermark-bounded; on a batch DataFrame
    this is a plain ``dropDuplicates``."""
    if events.isStreaming:
        return events.dropDuplicatesWithinWatermark(list(key_cols))
    return events.dropDuplicates(list(key_cols))


def content_dedup_stream(
    docs: DataFrame, text_col: str = "text", fp_col: str = "__fp"
) -> DataFrame:
    """Content-hash dedup at ingest: key = md5 of the normalized
    text (the same canonical fingerprint as
    :func:`operators.dedup.exact_dedup_keys`), so the stream admits
    one document per distinct content."""
    keyed = docs.withColumn(fp_col, F.md5(normalize(F.col(text_col))))
    return exact_dedup_stream(keyed, [fp_col]).drop(fp_col)


# -- MinHash/LSH near-dup at ingest -------------------------------------


def minhash_signature_col(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
    out: str = "__sig",
) -> DataFrame:
    """Per-ROW MinHash signature (``array<bigint>`` of length K) as a
    pure Column computation — the streaming-safe twin of
    :func:`operators.dedup.minhash_signatures`, which explodes
    shingles into a groupBy (a stateful aggregation on a stream, and
    the wrong state shape for ingest). Same hash family — md5-derived
    60-bit shingle hash, K affine rehashes mod ``MINHASH_P`` — so a
    signature computed at ingest equals the batch operator's for the
    same document. Array lambdas run interpreted (not codegen), which
    is the right trade per row at ingest: state stays zero and no
    shuffle is introduced.
    """
    from data_frame_spark.functions.texthash import hash60

    sh = F.array_distinct(word_shingles(F.col(text_col), shingle_n))
    hs = F.transform(sh, lambda s: hash60(s) % F.lit(MINHASH_P))
    tmp = df.withColumn("__mh_hs", hs)
    mins = []
    for k in range(num_hashes):
        a, b = minhash_params(k)
        mins.append(
            F.array_min(
                F.transform(
                    F.col("__mh_hs"),
                    lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P),
                )
            )
        )
    return tmp.withColumn(out, F.array(*mins)).drop("__mh_hs")


def signature_dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-dup gate at ingest, strong form: admit one document per
    FULL MinHash signature within the watermark. A signature-equal
    pair is an extremely-high-Jaccard near-duplicate (all K minima
    collide), so this catches boilerplate/trivially-edited reposts
    with a single watermark-bounded stateful operator and no shuffle
    beyond the dedup's own key exchange."""
    keyed = minhash_signature_col(
        docs, text_col, num_hashes, shingle_n, out="__sig"
    ).withColumn("__sk", F.md5(F.concat_ws("|", F.col("__sig"))))
    return exact_dedup_stream(keyed, ["__sk"]).drop("__sig", "__sk")


def lsh_band_claims_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Banded LSH near-dup gate at ingest, sensitive form: each
    document tries to CLAIM its ``bands`` band buckets;
    ``dropDuplicatesWithinWatermark`` on the band key awards every
    bucket to its earliest claimant, and a document is a near-dup
    suspect iff it failed to claim at least one bucket (some earlier
    document shared that band — the same any-band-collision rule as
    the batch :func:`operators.dedup.lsh_candidate_pairs`).

    Returns (id, ts, claimed) — one row per surviving claim. Batch
    parity: ``claims.groupBy(id).count() == bands`` selects admitted
    documents; on a stream the count is a second stateful operator
    (windowed on the watermarked ``ts``), which Spark chains in
    append mode (multiple-stateful-operator support). State is
    bounded by the watermark on both operators: |buckets| keys plus
    |documents| counters per window, each dropped once the watermark
    passes.
    """
    sigs = minhash_signature_col(docs, text_col, num_hashes, shingle_n, out="__sig")
    rows_per_band = num_hashes // bands
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(b),
                *[
                    F.element_at(F.col("__sig"), b * rows_per_band + i + 1)
                    for i in range(rows_per_band)
                ],
            )
        )
        for b in range(bands)
    ]
    claims = sigs.select(
        F.col(id_col).alias("id"), F.col("ts"), F.explode(F.array(*band_cols)).alias("band_key")
    )
    if claims.isStreaming:
        return claims.dropDuplicatesWithinWatermark(["band_key"])
    # batch parity: the earliest claimant wins, deterministically
    # (dropDuplicates keeps an arbitrary row; min_by pins the stream's
    # first-arrival semantics — ts is unique per document here)
    return (
        claims.groupBy("band_key")
        .agg(F.min_by(F.struct("id", "ts"), F.struct("ts", "id")).alias("__w"))
        .select(F.col("__w.id").alias("id"), F.col("__w.ts").alias("ts"), "band_key")
    )


def lsh_admitted_batch(claims: DataFrame, bands: int = 4) -> DataFrame:
    """Documents whose every band bucket was self-claimed (no earlier
    near-duplicate): the admission filter over
    :func:`lsh_band_claims_stream` output."""
    return (
        claims.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_claimed"))
        .where(F.col("n_claimed") == F.lit(bands))
        .select("id")
    )
