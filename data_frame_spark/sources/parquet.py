"""Partitioned parquet table layout — the 100 TB storage contract.

The driver tables are single parquet files; a production corpus is a
hive-partitioned directory tree (``lang=en/source=web/part-*.parquet``)
so that partition-key predicates PRUNE whole directories at planning
time (zero I/O for excluded partitions — visible as
``PartitionFilters`` on the scan) and so that downstream jobs can
process partitions independently.

Two scale hazards this module encodes:

* **small-files explosion**: with hash-partitioned upstream data,
  EVERY write task holds rows of EVERY hive partition, producing
  tasks × partitions files. ``write_partitioned`` therefore
  repartitions by the partition columns first (one shuffle), so each
  hive partition is written by as few tasks as possible.
* **giant-file stragglers**: one hot partition (``lang=en`` is half a
  web corpus) would otherwise become one task writing one huge file;
  ``max_records_per_file`` re-splits output files at a row bound
  (Spark's own writer-level split, no extra shuffle), and
  ``salt_files > 1`` additionally spreads a hot partition's rows over
  that many write tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = 1_000_000,
    salt_files: int = 1,
) -> None:
    """Write a hive-partitioned parquet table (see module docstring
    for the repartition / file-size rationale)."""
    if salt_files > 1:
        # deterministic content-hash salt (never rand(): task retries
        # must route each row to the same shuffle partition); the
        # explicit partition count pins the fan-out — AQE would
        # otherwise coalesce the salted splits right back together
        keys = [F.col(c) for c in partition_cols] + [
            F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_files))
        ]
        # the conf is non-numeric on platforms that set it to "auto"
        # for adaptive coalescing — fall back to the cluster's default
        # parallelism rather than failing the write
        try:
            n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            n = df.sparkSession.sparkContext.defaultParallelism
        out = df.repartition(max(n, salt_files), *keys)
    else:
        out = df.repartition(*[F.col(c) for c in partition_cols])
    writer = out.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a hive-partitioned table; partition columns come back as
    real columns (typed by directory-name inference), and filters on
    them prune directories at planning time."""
    return spark.read.parquet(path)
