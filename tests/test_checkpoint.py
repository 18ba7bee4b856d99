"""Kill-and-resume: a run stopped after some bucket groups must resume
without recomputing committed partitions, and the final output must equal
the non-checkpointed pipeline's output (Tier D, SURVEY.md §5.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from surya_spark import datagen, pipeline
from surya_spark.plans.checkpoint import CheckpointRunner

N_DOCS = 24


def _spans_dict(df):
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        ]
        for r in df.collect()
    }


def test_stage_resume_skips_committed(spark, tmp_path):
    base = str(tmp_path / "ckpt")
    docs = datagen.gen_documents(spark, N_DOCS, partitions=2)
    blobs = datagen.gen_page_blobs(spark, N_DOCS, partitions=2)
    runner = CheckpointRunner(spark, base, n_buckets=8, n_groups=4)

    # "killed" run: only 2 of 4 groups commit
    runner.stage("pages", lambda: pipeline.pages_for(docs, blobs),
                 bucket_key="media_ref", max_groups=2)
    lin1 = runner.lineage()
    assert lin1.filter(F.col("stage") == "pages").count() == 4  # 2 groups × 2 buckets

    # resume: completes the remaining groups only
    out = runner.stage("pages", lambda: pipeline.pages_for(docs, blobs),
                       bucket_key="media_ref")
    lin2 = runner.lineage()
    assert lin2.filter(F.col("stage") == "pages").count() == 8
    # exactly one lineage record per bucket → nothing was recomputed
    per_bucket = (
        lin2.filter(F.col("stage") == "pages")
        .groupBy("bucket").count().collect()
    )
    assert all(r["count"] == 1 for r in per_bucket)

    expected = pipeline.pages_for(docs, blobs).count()
    assert out.count() == expected

    # second resume call: fully committed → no new lineage rows
    runner.stage("pages", lambda: pipeline.pages_for(docs, blobs),
                 bucket_key="media_ref")
    assert runner.lineage().filter(F.col("stage") == "pages").count() == 8


def test_checkpointed_extract_matches_direct(spark, tmp_path):
    base = str(tmp_path / "ckpt_e2e")
    docs = datagen.gen_documents(spark, N_DOCS, partitions=2)
    blobs = datagen.gen_page_blobs(spark, N_DOCS, partitions=2)

    direct = _spans_dict(pipeline.extract(docs, blobs, with_tables=True))
    ckpt = _spans_dict(
        pipeline.checkpointed_extract(spark, docs, blobs, base,
                                      n_buckets=8, n_groups=2)
    )
    assert ckpt == direct

    runner = CheckpointRunner(spark, base, n_buckets=8, n_groups=2)
    m = runner.metrics().collect()
    stages = {r["stage"] for r in m}
    # r7: the default resumable path checkpoints the FUSED plan — the
    # tagged crop union replaces the pre-fusion line-table stage
    assert stages == {"pages", "all_crops", "ocr_lines", "cells"}
    assert all(r["errors"] == 0 for r in m)


def test_checkpointed_resume_on_fused_stages(spark, tmp_path):
    """Kill-and-resume ACROSS the r7 fused stage set: a run that commits
    only the first bucket group of every stage must, on re-invocation,
    complete the rest without recomputing committed groups and still
    equal the direct fused pipeline byte-for-byte."""
    base = str(tmp_path / "ckpt_resume_fused")
    docs = datagen.gen_documents(spark, N_DOCS, partitions=2)
    blobs = datagen.gen_page_blobs(spark, N_DOCS, partitions=2)

    # "killed" run: 1 of 2 groups per stage
    pipeline.checkpointed_extract(spark, docs, blobs, base,
                                  n_buckets=4, n_groups=2, max_groups=1)
    runner = CheckpointRunner(spark, base, n_buckets=4, n_groups=2)
    lin1 = runner.lineage()
    assert lin1.filter(F.col("stage") == "all_crops").count() == 2

    # resume to completion
    out = pipeline.checkpointed_extract(spark, docs, blobs, base,
                                        n_buckets=4, n_groups=2)
    lin2 = CheckpointRunner(spark, base, n_buckets=4, n_groups=2).lineage()
    per_stage = {r["stage"]: r["cnt"] for r in
                 lin2.groupBy("stage").agg(F.count("*").alias("cnt")).collect()}
    assert per_stage["all_crops"] == 4
    # committed groups were NOT recomputed (still exactly one lineage row
    # per committed bucket)
    assert lin2.groupBy("stage", "bucket").count().filter(
        F.col("count") > 1).count() == 0

    direct = _spans_dict(pipeline.extract(docs, blobs, with_tables=True))
    assert _spans_dict(out) == direct
