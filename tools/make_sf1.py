"""Generate a 10x scale-up of sf0.1 under .scratch/sf1 for the
scaling probe (round-6 verdict item #6). Replicas are DECORRELATED so
dedup-style queries scale by corpus size, not by artificial
cross-replica duplicates:
- documents: per-replica character substitution (translate) rewrites
  tokens while preserving lengths/counts, so per-replica statistics
  match the original but cross-replica shingles differ
- embeddings: per-replica deterministic sign flips (md5-derived ±1
  per dimension) preserve norms exactly and drive cross-replica
  cosine to ~0 (a circular rotation does NOT decorrelate — adjacent
  dims are correlated, so rotated copies stayed near-duplicates and
  inflated the sf1 cluster count 31x in the first probe)
- events: id/user offsets; values and timestamps unchanged
"""
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from data_frame_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/sf1"
R = 10

spark = get_spark("make-sf1")
spark.sparkContext.setLogLevel("ERROR")

alpha = "etaoinshrd"

docs = spark.read.parquet(f"{SRC}/documents.parquet")
parts = []
for i in range(R):
    if i == 0:
        parts.append(docs)
    else:
        rot = alpha[i:] + alpha[:i]
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.translate("text", alpha, rot).alias("text"),
                "lang", "source", "n_chars",
            )
        )
big = parts[0]
for p in parts[1:]:
    big = big.unionByName(p)
big.repartition(32).write.mode("overwrite").parquet(f"{DST}/documents.parquet")
print("documents:", spark.read.parquet(f"{DST}/documents.parquet").count())

emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
d = len(emb.select("embedding").first()["embedding"])
import hashlib

parts = []
for i in range(R):
    if i == 0:
        parts.append(emb)
    else:
        signs = [
            1.0 if int(hashlib.md5(f"s{i}:{j}".encode()).hexdigest()[:2], 16) % 2
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
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                flipped.alias("embedding"),
                "label",
            )
        )
big = parts[0]
for p in parts[1:]:
    big = big.unionByName(p)
big.repartition(32).write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")
print("embeddings:", spark.read.parquet(f"{DST}/embeddings.parquet").count())

ev = spark.read.parquet(f"{SRC}/events.parquet")
parts = []
for i in range(R):
    if i == 0:
        parts.append(ev)
    else:
        parts.append(
            ev.select(
                (F.col("event_id") + F.lit(i * 100_000_000)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i * 1_000_000_000)).alias("user_id"),
                "event_type", "value", "props",
            )
        )
big = parts[0]
for p in parts[1:]:
    big = big.unionByName(p)
big.repartition(32).write.mode("overwrite").parquet(f"{DST}/events.parquet")
print("events:", spark.read.parquet(f"{DST}/events.parquet").count())

# TPC-H fact/dim replicas (round 7 — probe the de-broadcast join
# queries): key offsets keep the orderkey/custkey join structure
# within each replica; nation/region stay as-is (attribute domains,
# fixed at any SF — sf1 queries read them from SRC directly)
OK_OFF, CK_OFF = 100_000_000, 10_000_000

li = spark.read.parquet(f"{SRC}/lineitem.parquet")
parts = [li] + [
    li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * OK_OFF))
    for i in range(1, R)
]
big = parts[0]
for p in parts[1:]:
    big = big.unionByName(p)
big.repartition(32).write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")
print("lineitem:", spark.read.parquet(f"{DST}/lineitem.parquet").count())

orders = spark.read.parquet(f"{SRC}/orders.parquet")
parts = [orders] + [
    orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * OK_OFF))
    .withColumn("o_custkey", F.col("o_custkey") + F.lit(i * CK_OFF))
    for i in range(1, R)
]
big = parts[0]
for p in parts[1:]:
    big = big.unionByName(p)
big.repartition(32).write.mode("overwrite").parquet(f"{DST}/orders.parquet")
print("orders:", spark.read.parquet(f"{DST}/orders.parquet").count())

cust = spark.read.parquet(f"{SRC}/customer.parquet")
parts = [cust] + [
    cust.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * CK_OFF))
    for i in range(1, R)
]
big = parts[0]
for p in parts[1:]:
    big = big.unionByName(p)
big.repartition(32).write.mode("overwrite").parquet(f"{DST}/customer.parquet")
print("customer:", spark.read.parquet(f"{DST}/customer.parquet").count())

for dim in ("nation", "region"):
    spark.read.parquet(f"{SRC}/{dim}.parquet").write.mode("overwrite").parquet(
        f"{DST}/{dim}.parquet"
    )
    print(dim, "copied")

# part/supplier: copied UNREPLICATED — lineitem replicas keep their
# original l_partkey/l_suppkey, so each row still joins exactly one
# part/supplier row (dimension-style). Right for timing probes; a
# true TPC-H SF10 would grow these ∝ SF.
for dim in ("part", "supplier"):
    spark.read.parquet(f"{SRC}/{dim}.parquet").write.mode("overwrite").parquet(
        f"{DST}/{dim}.parquet"
    )
    print(dim, "copied")
