"""KMV sketch: exact-below-k rule, estimation error, merge monoid."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_frame_spark.operators.sketch import kmv_distinct


def test_kmv_exact_when_small(spark):
    df = spark.createDataFrame([(i % 17,) for i in range(400)], "v long")
    row = kmv_distinct(df, "v", k=64).collect()[0]
    assert row["exact_distinct"] == 17
    assert row["kmv_k"] == 17
    assert row["estimate"] == 17.0  # D <= k: sketch holds every hash


def test_kmv_boundary_d_equals_k_uses_sketch_estimator(spark):
    # D == k: the min-set is full, so the gate (kmv_k < k) routes to
    # the (k-1)/u_k estimator — the rule the streaming sketch applies
    # (streaming/sketch.py), keeping stream==batch parity exact at the
    # boundary. The estimate must come from the sketch alone, never
    # from exact_distinct.
    from data_frame_spark.functions.texthash import hash60
    from data_frame_spark.operators.sketch import _HASH_SPACE

    k = 16
    df = spark.createDataFrame([(i,) for i in range(k)], "v long")
    row = kmv_distinct(df, "v", k=k).collect()[0]
    assert row["kmv_k"] == k and row["exact_distinct"] == k
    hk = max(
        r["h"] for r in df.select(hash60(F.col("v").cast("string")).alias("h")).collect()
    )
    assert row["estimate"] == (k - 1) / (hk / _HASH_SPACE)


def test_kmv_estimate_within_error_bound(spark):
    # D = 5000 distinct values, k = 256: rel error ~1/sqrt(k-2) ≈ 6.3%;
    # assert a generous 4-sigma band (deterministic: md5 is fixed)
    df = spark.createDataFrame([(i,) for i in range(5000)], "v long")
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert row["kmv_k"] == 256
    assert abs(row["estimate"] - 5000) / 5000 < 0.25, row["estimate"]


def test_kmv_duplicates_do_not_inflate(spark):
    a = spark.createDataFrame([(i,) for i in range(3000)], "v long")
    b = a.unionAll(a).unionAll(a)  # heavy duplication, same D
    ra = kmv_distinct(a, "v", k=128).collect()[0]
    rb = kmv_distinct(b, "v", k=128).collect()[0]
    assert ra["estimate"] == rb["estimate"]
    assert ra["exact_distinct"] == rb["exact_distinct"] == 3000


def test_kmv_grouped_matches_per_group_run(spark):
    df = spark.createDataFrame(
        [(f"g{i % 3}", i % (40 * (1 + i % 3))) for i in range(2000)],
        "g string, v long",
    )
    grouped = {r["scope"]: r for r in kmv_distinct(df, "v", group_col="g", k=32).collect()}
    for gname in ("g0", "g1", "g2"):
        solo = kmv_distinct(df.where(F.col("g") == gname), "v", k=32).collect()[0]
        assert grouped[gname]["estimate"] == solo["estimate"]
        assert grouped[gname]["exact_distinct"] == solo["exact_distinct"]


def test_kmv_merge_monoid(spark):
    # sketch(A ∪ B) == sketch over the union of the shards' min-sets:
    # k-mins of (k-mins(A) ∪ k-mins(B)) equal k-mins(A ∪ B)
    k = 64
    a = spark.createDataFrame([(i,) for i in range(0, 4000, 2)], "v long")
    b = spark.createDataFrame([(i,) for i in range(0, 4000, 3)], "v long")
    whole = kmv_distinct(a.unionAll(b), "v", k=k).collect()[0]

    from data_frame_spark.functions.texthash import hash60
    mins_a = (
        a.select(hash60(F.col("v").cast("string")).alias("h"))
        .distinct().orderBy("h").limit(k)
    )
    mins_b = (
        b.select(hash60(F.col("v").cast("string")).alias("h"))
        .distinct().orderBy("h").limit(k)
    )
    merged = sorted(
        r["h"] for r in mins_a.unionAll(mins_b).distinct().orderBy("h").limit(k).collect()
    )
    kth = merged[k - 1]
    est = (k - 1) / (float(kth) / float(1 << 60))
    assert est == whole["estimate"]


def test_kmv_empty_input(spark):
    df = spark.createDataFrame([], "v long")
    assert kmv_distinct(df, "v", k=8).collect() == []


def test_kmv_nulls_count_as_one_value(spark):
    # NULL casts to a NULL hash -> dropped by distinct? hash60(NULL)
    # is NULL; a NULL hash would poison MAX/row_number ordering, so
    # pin the actual behavior: NULLs contribute no hash rows
    df = spark.createDataFrame([(None,), (1,), (2,), (None,)], "v long")
    row = kmv_distinct(df, "v", k=8).collect()[0]
    assert row["exact_distinct"] in (2, 3)


def test_cms_never_undercounts_and_merges(spark):
    from data_frame_spark.operators.sketch import cms_build, cms_estimate

    rows = [(w,) for w, k in [("a", 50), ("b", 30), ("c", 7), ("d", 1)] for _ in range(k)]
    df = spark.createDataFrame(rows, "token string")
    keys = df.distinct()
    ctr = cms_build(df, "token", width=4, depth=3)  # tiny: forced collisions
    est = {r["token"]: r["cms_count"]
           for r in cms_estimate(ctr, keys, "token", width=4, depth=3).collect()}
    exact = {"a": 50, "b": 30, "c": 7, "d": 1}
    for w, c in exact.items():
        assert est[w] >= c  # CMS never undercounts
    # merge monoid: counters of two shards sum to the full counters
    import pyspark.sql.functions as F

    h1 = df.where(F.col("token").isin("a", "c"))
    h2 = df.where(~F.col("token").isin("a", "c"))
    merged = (
        cms_build(h1, "token", width=4, depth=3)
        .unionByName(cms_build(h2, "token", width=4, depth=3))
        .groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    full = {(r["row"], r["bucket"]): r["cnt"] for r in ctr.collect()}
    got = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert got == full


def test_cms_unknown_key_reads_zero_or_collision(spark):
    from data_frame_spark.operators.sketch import cms_build, cms_estimate

    df = spark.createDataFrame([("x",)] * 5, "token string")
    keys = spark.createDataFrame([("never-seen",)], "token string")
    est = cms_estimate(cms_build(df, "token", width=1024, depth=3),
                       keys, "token", width=1024, depth=3).collect()[0]
    # wide sketch, single stored key: the unknown key's buckets are
    # almost surely empty -> estimate 0 (and never negative)
    assert est["cms_count"] >= 0
