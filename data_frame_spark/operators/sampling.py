"""Deterministic sampling for corpus curation.

Training-data pipelines sample constantly — per-language quotas,
eval holdouts, debugging slices — and at 100 TB the sample must be
(a) reproducible run-to-run and cluster-layout-independent, and
(b) computed without funneling data through one partition. Both
operators therefore order by a content-derived md5 hash, never by
``rand()`` (which is partition-layout dependent) — the same
public "hash-order sampling" recipe used for stable train/eval
splits, and exactly reproducible by a SQL oracle.

* :func:`stratified_sample` — exact N per stratum via a per-stratum
  hash-rank window. The window shuffles by stratum; strata are
  assumed numerous relative to executors (languages, sources,
  buckets). For a FEW huge strata the two-phase variant applies: a
  map-side filter on ``hash < adaptive threshold`` (from a
  per-stratum count + quantile sketch) cuts each stratum to ~N
  survivors before the exact rank — the window then runs on a
  vanishingly small remnant. That refinement drops in behind the
  same signature; the rank formulation here IS the exactness
  contract.
* :func:`uniform_sample` — global top-k by hash:
  ``TakeOrderedAndProject`` computes per-partition top-k then
  merges k·partitions rows — no global sort, no single-partition
  window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sample_key(id_col, salt: str = "") -> F.Column:
    """Deterministic per-row ordering key: md5 of the row id plus a
    salt (vary the salt to draw independent samples)."""
    return F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|" + salt)))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, chosen by
    md5-hash order — reproducible regardless of partitioning, input
    order, or cluster size. Adds ``sample_rank`` (1-based within the
    stratum)."""
    w = Window.partitionBy(stratum_col).orderBy(sample_key(id_col, salt), F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= F.lit(n_per_stratum))
    )


def uniform_sample(df: DataFrame, id_col: str, k: int, salt: str = "") -> DataFrame:
    """Deterministic global k-row sample: ascending hash order,
    ties broken by id. Plans as TakeOrderedAndProject (partial
    per-partition top-k, driver merge of k rows per partition)."""
    return df.orderBy(sample_key(id_col, salt), F.col(id_col)).limit(k)
