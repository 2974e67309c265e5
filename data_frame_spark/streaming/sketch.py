"""Streaming KMV cardinality monitoring (applyInPandasWithState).

Running distinct-count estimates at ingest — "how many distinct
users/documents has this stream seen per key so far" — without
storing the identities. The state per group is exactly the KMV
min-set (:mod:`operators.sketch`): the k smallest md5-derived 60-bit
hashes seen so far. That state is

* **bounded**: k longs per group, regardless of stream length;
* **a monoid**: merging a micro-batch = union the hashes, keep the k
  smallest — associative and order-insensitive, so the estimate
  after ANY ingest order equals the batch sketch over the same rows
  (pinned by the stream==batch test);
* **deterministic**: md5 hashing means reruns and replays produce
  identical estimates.

Emits one row per touched group per micro-batch (update mode).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from data_frame_spark.functions.texthash import hash60
from data_frame_spark.operators.sketch import _HASH_SPACE

OUTPUT_SCHEMA = "scope string, kmv_k long, estimate double"
STATE_SCHEMA = "mins array<long>"


def _make_updater(k: int):
    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (scope,) = key
        mins = list(state.get[0]) if state.exists else []
        have = set(mins)
        for pdf in pdfs:
            for h in pdf["__h"]:
                h = int(h)
                if h not in have:
                    have.add(h)
                    mins.append(h)
        mins = sorted(mins)[:k]
        state.update((mins,))
        m = len(mins)
        if m < k:
            est = float(m)  # sketch still holds every hash: exact
        else:
            est = float(k - 1) / (float(mins[-1]) / _HASH_SPACE)
        yield pd.DataFrame([{"scope": scope, "kmv_k": m, "estimate": est}])

    return update


def streaming_kmv(
    stream: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Running per-group KMV distinct estimate over a stream. The
    pre-hash projection keeps the state store free of raw values —
    only 60-bit hashes cross into state (privacy + k·8 bytes/group).
    """
    hashed = stream.select(
        F.col(group_col).cast("string").alias("scope"),
        hash60(F.col(value_col).cast("string")).alias("__h"),
    )
    return hashed.groupBy("scope").applyInPandasWithState(
        _make_updater(k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_cms(
    stream: DataFrame, key_col: str, width: int = 1024, depth: int = 3
) -> DataFrame:
    """Running count-min counters over a stream — frequency / heavy-
    hitter monitoring at ingest without storing identities. Reuses
    the EXACT probe layout of :func:`operators.sketch.cms_build`
    (depth disjoint md5 hex slices mod width), so at any point the
    streamed counters equal the batch sketch over the rows ingested
    so far, bit for bit (pinned by the stream==batch parity test),
    and :func:`operators.sketch.cms_estimate` reads them unchanged.

    No custom state handler at all: counters ARE a streaming
    aggregation keyed by (row, bucket) in update mode, so the state
    store holds at most depth x width longs however long the stream
    runs — the same bounded-state argument as the KMV min-sets, with
    Spark's native fault-tolerant aggregation state doing the work.
    """
    from data_frame_spark.operators.sketch import CMS_SLICE_STARTS, _cms_pos

    if depth > len(CMS_SLICE_STARTS):
        raise ValueError(f"depth <= {len(CMS_SLICE_STARTS)} supported")
    h = F.md5(F.col(key_col).cast("string"))
    probes = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                _cms_pos(h, CMS_SLICE_STARTS[j], width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        stream.select(F.explode(probes).alias("p"))
        .groupBy(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
