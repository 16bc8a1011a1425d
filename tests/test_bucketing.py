from __future__ import annotations

from pyspark.sql import functions as F

from zparse_spark.sources.bucketing import bucketed_join, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "li_bucketed", "l_orderkey", n_buckets=8)
    write_bucketed(o, "o_bucketed", "l_orderkey", n_buckets=8)

    # bucketing matters in the sort-merge regime (tiny test tables would
    # otherwise take the broadcast path and the planner disables bucket
    # reading); at 100 TB both sides are far past any broadcast threshold
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "li_bucketed", "o_bucketed", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:1500]  # co-located: shuffles elided
        expect = li.join(o, "l_orderkey").count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")
