"""Generate a 100x scale-up (sf10) of the tables the expensive probe
families read — lineitem (graph_suite_family, quantiles), embeddings
(ivf_family / embedding_dedup_family), and since r19 (VERDICT #6:
every family with a data-sized shuffle gets a probe row) documents
(spans / segment_dedup / near_dup / decontamination) and events
(meanmax) — under .scratch/sf10, for the second-decade scaling probe
(timing slope + row-count sanity only; no oracle at this scale).

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

# documents (r19): 10 replicas of sf1's documents. sf1's replicas are
# cyclic ROTATIONS of the 10-letter alphabet — composing another
# rotation would collide (rot_i . rot_j = rot_{i+j mod 10}: outer
# replicas would contain byte-identical texts under different
# doc_ids, the exact artificial-duplicate failure make_sf1's
# docstring documents). Each outer replica therefore applies an
# md5-derived PERMUTATION of the same alphabet (length-preserving,
# so per-replica token/char statistics still match): two permutations
# differing by exactly a rotation has probability ~10/10! per pair —
# negligible across 10 draws. Shingles/segments/13-grams decorrelate,
# so dedup-family work scales with corpus size, not duplicate count.
alpha = "etaoinshrd"
docs = spark.read.parquet(f"{SRC}/documents.parquet")
parts = []
for i in range(R):
    if i == 0:
        parts.append(docs)
    else:
        perm = sorted(
            alpha,
            key=lambda ch: hashlib.md5(f"d{i}:{ch}".encode()).hexdigest(),
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 100_000_000)).alias("doc_id"),
                F.translate("text", alpha, "".join(perm)).alias("text"),
                "lang", "source", "n_chars",
            )
        )
big = parts[0]
for p in parts[1:]:
    big = big.unionByName(p)
big.repartition(64).write.mode("overwrite").parquet(f"{DST}/documents.parquet")
print("documents:", spark.read.parquet(f"{DST}/documents.parquet").count())

# events (r19): id/user offsets above sf1's ranges (sf1 used
# i*1e8 / i*1e9; the outer replica steps by 1e9 / 1e10)
ev = spark.read.parquet(f"{SRC}/events.parquet")
parts = []
for i in range(R):
    if i == 0:
        parts.append(ev)
    else:
        parts.append(
            ev.select(
                (F.col("event_id") + F.lit(i * 1_000_000_000)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i * 10_000_000_000)).alias("user_id"),
                "event_type", "value", "props",
            )
        )
big = parts[0]
for p in parts[1:]:
    big = big.unionByName(p)
big.repartition(64).write.mode("overwrite").parquet(f"{DST}/events.parquet")
print("events:", spark.read.parquet(f"{DST}/events.parquet").count())
