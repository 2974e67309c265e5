"""Deterministic bloom-filter join pruning (operators/bloomfilter.py)."""

import pytest
from pyspark.sql import functions as F

from data_frame_spark.operators import bloomfilter as BF
from data_frame_spark.plans import checks as C


def test_no_false_negatives_and_exact_membership_bits(spark):
    # every built key MUST pass its own filter (the bloom contract);
    # with a bitmap big enough to stay sparse, outsiders mostly fail
    keys = spark.createDataFrame([(i,) for i in range(0, 500, 2)], ["k"])
    nb = BF.bits_for(250, fp=0.01)
    words = BF.bloom_build(keys, "k", nb, k=3)
    assert len(words) == nb // BF.WORD_BITS
    probe = spark.createDataFrame([(i,) for i in range(500)], ["k"])
    kept = {
        r["k"]
        for r in BF.bloom_prune(probe, "k", words, nb, k=3).collect()
    }
    members = set(range(0, 500, 2))
    assert members <= kept  # no false negatives, ever
    fp = len(kept - members) / 250
    assert fp < 0.05  # sized for 1%; generous margin, deterministic

    # byte-determinism: rebuilding from a differently-partitioned
    # frame yields the identical word list (bit_or is order-free)
    words2 = BF.bloom_build(keys.repartition(7), "k", nb, k=3)
    assert words == words2


def test_bits_for_sizing():
    assert BF.bits_for(1, fp=0.5) % BF.WORD_BITS == 0
    # more keys / tighter fp -> monotonically more bits
    assert BF.bits_for(10_000) > BF.bits_for(1_000) > BF.bits_for(100)
    assert BF.bits_for(1_000, fp=0.001) > BF.bits_for(1_000, fp=0.1)
    # ~1.4-1.5 bytes/key at 1% k=3 (the docstring claim)
    assert 10 <= BF.bits_for(10_000) / 10_000 <= 13
    with pytest.raises(ValueError):
        BF.bits_for(0)
    with pytest.raises(ValueError):
        BF.bits_for(10, fp=1.0)
    with pytest.raises(ValueError):
        BF.bits_for(10, k=0)


def test_guards(spark):
    keys = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError, match="multiple of 63"):
        BF.bloom_build(keys, "k", 64, k=3)
    with pytest.raises(ValueError, match="k must be"):
        BF.bloom_build(keys, "k", 63, k=0)
    with pytest.raises(ValueError, match="words length"):
        BF.bloom_might_contain(F.col("k"), [0, 0], 63, k=3)


def test_null_keys_skipped_and_dropped(spark):
    keys = spark.createDataFrame([(1,), (None,)], "k int")
    words = BF.bloom_build(keys, "k", 63 * 4, k=3)
    probe = spark.createDataFrame([(1,), (None,)], "k int")
    got = [r["k"] for r in BF.bloom_prune(probe, "k", words, 63 * 4, k=3).collect()]
    # the member passes; the NULL probe drops (like the join it stands
    # in for)
    assert got == [1]


def test_probe_plan_is_narrow(spark):
    # the 100 TB contract: the fact path is a pure scan filter — no
    # join, no exchange, no window; the bitmap is plan literals
    keys = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    nb = BF.bits_for(100)
    words = BF.bloom_build(keys, "k", nb, k=3)
    fact = spark.range(10_000).select(F.col("id").alias("k"))
    pruned = BF.bloom_prune(fact, "k", words, nb, k=3)
    assert C.count_shuffles(pruned) == 0
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan
