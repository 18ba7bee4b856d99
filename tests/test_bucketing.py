"""Bucketed co-located join: same-key bucketed tables must join without
any Exchange in the physical plan (the shuffle-elimination strategy for
repeated large joins at corpus scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from surya_spark.plans import bucketing


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse.dir is a static config — bucketed managed tables land in
    # ./spark-warehouse (gitignored)
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

    bucketing.write_bucketed(
        li.withColumnRenamed("l_orderkey", "okey"), "li_b", "okey", 8)
    bucketing.write_bucketed(
        o.withColumnRenamed("o_orderkey", "okey"), "o_b", "okey", 8)

    # force the sort-merge path: at real scale neither side broadcasts,
    # which is exactly when bucketing pays off
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.bucketed_join(spark, "li_b", "o_b", "okey")
        agg = joined.groupBy("okey").agg(F.count(F.lit(1)).alias("n"))

        # the join itself must not shuffle either side
        assert not bucketing.has_exchange(joined)
        # sanity: results match the unbucketed join
        expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expected

        # and the post-join aggregation on the bucket key also needs no
        # further exchange (partitioning is preserved through the join)
        assert not bucketing.has_exchange(agg)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
