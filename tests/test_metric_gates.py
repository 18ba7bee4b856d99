"""Tier C (SURVEY.md §5.2): benchmark metrics as distributed aggregates,
gated with the reference's CI score floors
(/root/reference/benchmark/utils/verify_benchmark_scores.py:5-44 —
det P,R > 0.9; order accuracy ≥ 0.75; table row/col ≥ 0.75). With the
deterministic surrogates the engine should be at/near 1.0 on all of them;
the gates prove the metric operators measure the right thing."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from surya_spark import datagen, pipeline
from surya_spark.functions import metrics
from surya_spark.operators import detection, layout, reading_order, tables

N_DOCS = 30


@pytest.fixture(scope="module")
def world(spark):
    docs = datagen.gen_documents(spark, N_DOCS, partitions=2)
    blobs = datagen.gen_page_blobs(spark, N_DOCS, partitions=2)
    pages = pipeline.pages_for(docs, blobs).persist()
    truth_rows = []
    for r in pages.collect():
        desc = datagen.decode_page(bytes(r["img_bytes"]))
        for i, ln in enumerate(desc["lines"]):
            x1, y1, x2, y2 = (float(v) for v in ln["bbox"])
            truth_rows.append(
                {"key": r["media_ref"], "box_id": i,
                 "x1": x1, "y1": y1, "x2": x2, "y2": y2})
    truth = spark.createDataFrame(pd.DataFrame(truth_rows))
    return docs, blobs, pages, truth


def test_detection_coverage_gates(spark, world):
    docs, blobs, pages, truth = world
    lines = detection.detection_stage(pages)
    pred = lines.select(
        F.col("media_ref").alias("key"),
        F.col("line_idx").cast("long").alias("box_id"),
        "x1", "y1", "x2", "y2",
    )
    pr = metrics.coverage_precision_recall(pred, truth, threshold=0.5)
    agg = pr.agg(F.avg("precision").alias("p"),
                 F.avg("recall").alias("r")).collect()[0]
    # reference CI floor: > 0.9; surrogate should be ~1.0
    assert agg["p"] > 0.9 and agg["r"] > 0.9


def test_reading_order_gate(spark, world):
    docs, blobs, pages, truth = world
    ordered = reading_order.order_lines(detection.detection_stage(pages))
    # match each predicted line to its truth line greedily, then compare
    # predicted position order to truth emit order
    from surya_spark.operators.matching import greedy_iou_match

    pred_boxes = ordered.select(
        F.col("media_ref").alias("key"),
        F.col("line_idx").cast("long").alias("box_id"),
        "x1", "y1", "x2", "y2", "position",
    )
    m = greedy_iou_match(pred_boxes, truth)
    pred_order = (
        m.join(pred_boxes.select("key", F.col("box_id").alias("pred_id"),
                                 "position"), ["key", "pred_id"])
        .select("key", F.col("ref_id").alias("item_id"),
                F.col("position").alias("position"))
    )
    ref_order = truth.select(
        "key", F.col("box_id").alias("item_id"),
        (F.col("box_id") + 1).cast("int").alias("position"),
    )
    acc = metrics.rank_accuracy(pred_order, ref_order).agg(
        F.avg("pair_accuracy").alias("a")).collect()[0]["a"]
    assert acc >= 0.75  # reference floor; surrogate ~1.0
    assert acc > 0.99


def test_table_grid_gate(spark, world):
    docs, blobs, pages, truth = world
    regions = layout.layout_stage(pages)
    crops = tables.table_crops(regions, pages)
    items = tables.table_items(crops)
    cells = tables.cell_grid(items)
    counts = (
        cells.groupBy("media_ref", "table_idx")
        .agg(F.count(F.lit(1)).alias("n_cells"),
             F.countDistinct("row_id").alias("nr"),
             F.countDistinct("col_id").alias("nc"))
    )
    bad = counts.filter(F.col("n_cells") != F.col("nr") * F.col("nc"))
    assert bad.count() == 0
    # every (row, col) appears exactly once (reference test_table_rec)
    dup = (
        cells.groupBy("media_ref", "table_idx", "row_id", "col_id")
        .count().filter("count > 1")
    )
    assert dup.count() == 0


def test_mean_iou_gate(spark, world):
    docs, blobs, pages, truth = world
    lines = detection.detection_stage(pages)
    pred = lines.select(
        F.col("media_ref").alias("key"),
        F.col("line_idx").cast("long").alias("box_id"),
        "x1", "y1", "x2", "y2",
    )
    miou = metrics.mean_iou_matched(pred, truth).agg(
        F.avg("mean_best_iou").alias("m")).collect()[0]["m"]
    assert miou >= 0.75  # table-rec floor analog; jitter+expand keeps ~0.85+


def test_edit_distance_gate_on_latex_path(spark):
    """Texify-style CI floor gate (<0.2 mean normalized edit distance,
    ref benchmark/utils/verify_benchmark_scores.py:41-44) on the LaTeX
    block-decode path. With the deterministic surrogate the distance vs
    truth is exactly 0; a corrupted prediction column checks the metric
    itself is not trivially zero."""
    from pyspark.sql import functions as F

    from surya_spark import datagen, pipeline
    from surya_spark.functions import metrics as M
    from surya_spark.operators import recognition

    docs = datagen.gen_documents(spark, 12, partitions=2)
    blobs = datagen.gen_page_blobs(spark, 12, partitions=2)
    pages = pipeline.pages_for(docs, blobs)
    preds = recognition.recognize_blocks(pages).select("media_ref", "text")

    # closed-form references: the surrogate block decode picks the truth
    # line covering the largest area of the whole-page crop
    refs = []
    for r in pages.collect():
        desc = datagen.decode_page(bytes(r["img_bytes"]))
        best, best_cover = None, -1.0
        for ln in desc["lines"]:
            x1, y1, x2, y2 = ln["bbox"]
            ix = max(0.0, min(x2, r["width"]) - max(x1, 0.0))
            iy = max(0.0, min(y2, r["height"]) - max(y1, 0.0))
            if ix * iy > best_cover:
                best, best_cover = ln, ix * iy
        refs.append((r["media_ref"], best["text"] if best else ""))
    ref_df = spark.createDataFrame(refs, "media_ref string, ref string")

    joined = preds.join(ref_df, "media_ref").select(
        F.col("text").alias("pred"), "ref")
    row = M.edit_distance_mean(joined).collect()[0]
    assert row["n"] > 0
    assert row["mean_edit_distance"] == 0.0  # surrogate is exact
    assert row["mean_edit_distance"] < 0.2   # the CI floor gate

    corrupted = joined.select(
        F.concat(F.lit("zz"), F.col("pred")).alias("pred"), "ref")
    bad = M.edit_distance_mean(corrupted).collect()[0]
    assert bad["mean_edit_distance"] > 0.0
