from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

BASE = 1_700_002_800_000_000  # epoch micros, hour-aligned
HOUR = 3_600_000_000


def _run_batch(spark, data_dir, ckpt, out_dir):
    stream = (
        spark.readStream.schema(SCHEMA)
        .parquet(data_dir)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .withWatermark("ts", "2 hours")
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .select(F.col("w.start").cast("long").alias("ws"), "n", "s")
    )
    # parquet sink: append mode + checkpoint recovery across runs
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    try:
        return {
            r["ws"]: (r["n"], r["s"]) for r in spark.read.parquet(out_dir).collect()
        }
    except Exception:
        return {}  # nothing emitted yet


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """Event-time watermark semantics: a straggler arriving after its
    window passed the watermark is dropped; the closed window's
    emitted result is final. Three availableNow runs over a shared
    checkpoint = three micro-batches (the watermark persists in the
    checkpoint between runs)."""
    data_dir = str(tmp_path / "data")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    os.makedirs(data_dir)

    def write(name, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            os.path.join(data_dir, name)
        )

    # batch 1: two on-time events in the first two hour-windows
    write("b1", [(1, BASE, 1, 1.0), (2, BASE + HOUR, 1, 2.0)])
    _run_batch(spark, data_dir + "/*", ckpt, out_dir)

    # batch 2: event time advances to +6h -> watermark becomes +4h;
    # windows before +4h close and emit
    write("b2", [(3, BASE + 6 * HOUR, 1, 3.0)])
    rows2 = _run_batch(spark, data_dir + "/*", ckpt, out_dir)
    base_s = BASE // 1_000_000
    assert rows2[base_s] == (1, 1.0)  # first window finalized

    # batch 3: straggler at +0.5h — 3.5h behind the watermark: dropped
    write("b3", [(4, BASE + HOUR // 2, 1, 100.0)])
    rows3 = _run_batch(spark, data_dir + "/*", ckpt, out_dir)
    assert rows3[base_s] == (1, 1.0)  # unchanged: straggler dropped
    assert not any(s == 101.0 for (_, s) in rows3.values())

    # batch semantics WOULD count it — the watermark is the delta
    batch = (
        spark.read.schema(SCHEMA)
        .parquet(data_dir + "/*")
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("long").alias("ws"), "n")
    )
    brows = {r["ws"]: r["n"] for r in batch.collect()}
    assert brows[base_s] == 2
