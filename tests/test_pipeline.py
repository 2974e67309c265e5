"""End-to-end corpus-pipeline integration: the chain a real
training-data build runs — quality filter → exact dedup →
duplicate-span scrub (keep one copy) → split assignment →
cross-split contamination audit → chunk → pack — assembled entirely
from the repo's operators on the sf0.001 fixture. Every stage is
individually oracle-checked elsewhere; this test pins that the
STAGES COMPOSE: schemas line up, row counts shrink monotonically
where they must, splits exhaust the corpus, and the packed output
respects its capacity invariant.
"""

from pyspark.sql import functions as F

from data_frame_spark.operators import dedup as OpDedup
from data_frame_spark.operators import sampling as OpSamp
from data_frame_spark.operators import text as OpText


def test_end_to_end_corpus_pipeline(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_raw = docs.count()
    assert n_raw > 0

    # 1. quality gate: cheap per-doc features, keep score >= 0.5
    scored = OpText.quality_score(docs, "text")
    kept = scored.where(F.col("quality_score") >= 0.5).select(
        "doc_id", "source", "text"
    )
    n_quality = kept.count()
    assert 0 < n_quality <= n_raw

    # 2. exact dedup: one canonical doc per normalized fingerprint
    canon = OpDedup.exact_dedup_keys(kept, "text", "doc_id")
    survivors = kept.join(
        canon.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    n_dedup = survivors.count()
    assert 0 < n_dedup <= n_quality

    # 3. duplicate-span scrub, keep-one-copy policy
    spans = OpDedup.duplicate_spans(
        survivors, "text", "doc_id", k=5, keep_first=True
    )
    scrubbed = OpDedup.scrub_spans(survivors, spans, "text", "doc_id")
    assert scrubbed.count() == n_dedup          # scrub never drops docs
    assert scrubbed.where(F.col("n_kept") > F.col("n_tokens")).count() == 0
    clean = scrubbed.where(F.col("n_kept") > 0).select(
        "doc_id", F.col("kept_text").alias("text")
    ).join(survivors.select("doc_id", "source"), "doc_id")

    # 4. deterministic splits exhaust the corpus
    assigned = OpSamp.assign_splits(
        clean, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}, salt="pipe"
    )
    counts = {r["split"]: r["n"] for r in
              assigned.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == clean.count()
    assert counts.get("train", 0) > counts.get("test", 0)

    # 5. cross-split audit on the SCRUBBED corpus: spans shared
    # verbatim between train and test got cut in step 3 only if they
    # were corpus-duplicated; the audit reports whatever leakage
    # remains and must at least run clean end-to-end
    audit = OpDedup.split_contamination_audit(
        assigned, "text", "doc_id", "split", n=5, rollup_col="source"
    )
    audit_rows = audit.collect()
    for r in audit_rows:
        assert r["n_pairs"] >= r["n_contaminated_docs"] > 0

    # 6. chunk + pack the train split
    train = assigned.where(F.col("split") == "train")
    chunks = OpText.chunk_rows(train, "text", "doc_id", chunk_tokens=64, overlap=16)
    assert chunks.count() >= train.count()      # >= one chunk per doc
    packed = OpText.concat_pack(
        chunks, "chunk_n_tokens", ["doc_id", "chunk_idx"], capacity=256
    )
    assert packed.count() == chunks.count()
    bad_offset = packed.where(
        (F.col("pack_offset") < 0) | (F.col("pack_offset") >= 256)
    ).count()
    assert bad_offset == 0
    # pack ids are dense from 0
    ids = packed.agg(
        F.min("pack_id").alias("lo"), F.max("pack_id").alias("hi"),
        F.countDistinct("pack_id").alias("n"),
    ).collect()[0]
    assert ids["lo"] == 0 and ids["n"] == ids["hi"] + 1
