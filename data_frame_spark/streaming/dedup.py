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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_frame_spark.operators.text import normalize


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
