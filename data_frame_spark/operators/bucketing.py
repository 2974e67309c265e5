"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle. If
both sides are written bucketed by the join key into the catalog
(``bucketBy(n, key).sortBy(key)``), Spark's scan reports a matching
``HashPartitioning`` output and the sort-merge join runs with ZERO
exchanges — the join is pre-shuffled at write time, amortized over
every subsequent query.

``write_bucketed`` / ``read_table`` wrap the catalog round-trip;
``tests/test_bucketing.py`` asserts the bucketed join plan really
contains no Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and bucket-sorted) catalog table."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
