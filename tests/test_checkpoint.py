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
    assert stages == {"pages", "lines", "ocr_lines", "cells"}
    assert all(r["errors"] == 0 for r in m)
