from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_frame_spark.operators.bucketing import write_bucketed, read_table
from data_frame_spark.plans import checks as C
from data_frame_spark.queries import t


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_bucketed", ["l_orderkey"], num_buckets=8)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "orders_bucketed",
        ["l_orderkey"],
        num_buckets=8,
    )
    yield "li_bucketed", "orders_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, li_t).join(read_table(spark, o_t), "l_orderkey")
        agg = joined.groupBy().agg(F.count(F.lit(1)).alias("n"))
        plan = C.simple_plan(joined)
        assert "SortMergeJoin" in plan
        assert C.count_shuffles(joined) == 0  # co-located: no Exchange
        # and it computes the right thing
        n = agg.collect()[0]["n"]
        assert n == read_table(spark, li_t).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
