"""Generate a 100x scale-up (sf10) of the TWO tables the expensive
probe families read — lineitem (graph_suite_family) and embeddings
(ivf_family / embedding_dedup_family) — under .scratch/sf10, for the
r16-verdict-#4 / r17-verdict-#4 second-decade scaling probe (timing
slope + row-count sanity only; no oracle at this scale).

Built as 10 replicas of .scratch/sf1 (itself 10x sf0.1):

- lineitem: orderkey offsets AND part/supp key offsets. sf1 kept the
  part/supplier domain fixed (so its graphs DENSIFIED); one more
  densification decade would square the triangle-join fan-out and
  measure density, not size. A 100 TB catalog grows its part domain,
  so the second decade grows NODES: each replica is a disjoint
  subgraph structurally identical to sf1's, and a linear-in-edges
  algorithm must read ~10x sf1's time.
- embeddings: vec_id offsets + per-replica md5-derived sign flips
  (seed family "t{i}:{j}", disjoint from make_sf1's "s{i}:{j}") —
  norms preserved exactly, cross-replica cosine ~0, so LSH/IVF
  bucket populations scale by corpus size, not by artificial
  near-duplicates.
"""
import hashlib
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from data_frame_spark.session import get_spark

SRC = "/root/repo/.scratch/sf1"
DST = "/root/repo/.scratch/sf10"
R = 10
OK_OFF = 10_000_000_000  # above sf1's max orderkey (10 * 100M)
PK_OFF = 100_000_000
SK_OFF = 10_000_000

spark = get_spark("make-sf10")
spark.sparkContext.setLogLevel("ERROR")

li = spark.read.parquet(f"{SRC}/lineitem.parquet")
parts = [li] + [
    li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * OK_OFF))
    .withColumn("l_partkey", F.col("l_partkey") + F.lit(i * PK_OFF))
    .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(i * SK_OFF))
    for i in range(1, R)
]
big = parts[0]
for p in parts[1:]:
    big = big.unionByName(p)
big.repartition(64).write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")
print("lineitem:", spark.read.parquet(f"{DST}/lineitem.parquet").count())

emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
d = len(emb.select("embedding").first()["embedding"])
parts = []
for i in range(R):
    if i == 0:
        parts.append(emb)
    else:
        signs = [
            1.0 if int(hashlib.md5(f"t{i}:{j}".encode()).hexdigest()[:2], 16) % 2
            else -1.0
            for j in range(d)
        ]
        flipped = F.zip_with(
            "embedding",
            F.array(*[F.lit(s) for s in signs]),
            lambda x, s: (x * s).cast("float"),
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * 100_000_000)).alias("vec_id"),
                flipped.alias("embedding"),
                "label",
            )
        )
big = parts[0]
for p in parts[1:]:
    big = big.unionByName(p)
big.repartition(64).write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")
print("embeddings:", spark.read.parquet(f"{DST}/embeddings.parquet").count())
