"""Plan-quality regression tests: the physical plans we tuned for must
not silently regress. Checks predicate pushdown, column pruning,
broadcast strategy, and rank-limit pushdown — the properties that decide
whether these operators survive a 100× scale-up."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown(spark):
    plan = _plan(entry_mod.q_pricing_summary(spark, SF))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split(
        "PushedFilters", 1)[1][:200]
    # column pruning: untouched wide columns never leave the scan
    # (plan string truncates the schema, so check the prefix)
    read_schema = plan.split("ReadSchema", 1)[1][:120]
    assert read_schema.startswith(": struct<l_quantity")
    assert "l_partkey" not in read_schema


def test_dim_joins_broadcast(spark):
    plan = _plan(entry_mod.q_top_revenue_nations(spark, SF))
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_knn_rank_pushdown(spark):
    plan = _plan(entry_mod.q_knn_bruteforce(spark, SF))
    # Spark's rank-limit pushdown: top-k filtered map-side before the
    # final window — without it every (query, vector) pair shuffles
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan  # small side broadcast


def test_minhash_no_interpreted_hofs(spark):
    # signature must be explode+min-aggregate (codegen), not the
    # interpreted nested-transform formulation
    from surya_spark.training import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(dedup.minhash_signatures(docs))
    assert "Generate explode" in plan or "Generate" in plan
    assert "xxhash64" in plan


def test_clean_boxes_anti_join_shape(spark):
    from surya_spark import datagen, pipeline
    from surya_spark.operators import detection

    docs = datagen.gen_documents(spark, 10, partitions=2)
    blobs = datagen.gen_page_blobs(spark, 10, partitions=2)
    pages = pipeline.pages_for(docs, blobs)
    plan = _plan(detection.clean_contained_boxes(
        detection.detect_lines(pages)))
    assert "LeftAnti" in plan  # containment filter is a real anti-join
