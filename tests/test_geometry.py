"""Geometry expression library vs the reference's PolygonBox semantics
(/root/reference/surya/common/polygon.py) — property-checked with closed-form
numpy oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from surya_spark.functions import geometry as G


def _boxes_df(spark, n=200, seed=7):
    rng = np.random.RandomState(seed)
    a = rng.uniform(0, 900, size=(n, 2))
    b = rng.uniform(1, 100, size=(n, 2))
    pdf = pd.DataFrame({
        "ax1": a[:, 0], "ay1": a[:, 1],
        "ax2": a[:, 0] + b[:, 0], "ay2": a[:, 1] + b[:, 1],
    })
    c = rng.uniform(0, 900, size=(n, 2))
    d = rng.uniform(1, 100, size=(n, 2))
    pdf["bx1"], pdf["by1"] = c[:, 0], c[:, 1]
    pdf["bx2"], pdf["by2"] = c[:, 0] + d[:, 0], c[:, 1] + d[:, 1]
    return spark.createDataFrame(pdf), pdf


def test_overlap_and_iou(spark):
    df, pdf = _boxes_df(spark)
    out = df.select(
        G.x_overlap(F.col("ax1"), F.col("ax2"), F.col("bx1"), F.col("bx2")).alias("xo"),
        G.intersection_area(
            F.col("ax1"), F.col("ay1"), F.col("ax2"), F.col("ay2"),
            F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2"),
        ).alias("inter"),
        G.iou(
            F.col("ax1"), F.col("ay1"), F.col("ax2"), F.col("ay2"),
            F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2"),
        ).alias("iou"),
    ).toPandas()

    xo = np.maximum(0, np.minimum(pdf.ax2, pdf.bx2) - np.maximum(pdf.ax1, pdf.bx1))
    yo = np.maximum(0, np.minimum(pdf.ay2, pdf.by2) - np.maximum(pdf.ay1, pdf.by1))
    inter = xo * yo
    area_a = (pdf.ax2 - pdf.ax1) * (pdf.ay2 - pdf.ay1)
    area_b = (pdf.bx2 - pdf.bx1) * (pdf.by2 - pdf.by1)
    iou = np.where(area_a + area_b - inter > 0, inter / (area_a + area_b - inter), 0)

    np.testing.assert_allclose(out["xo"], xo, rtol=1e-9)
    np.testing.assert_allclose(out["inter"], inter, rtol=1e-9)
    np.testing.assert_allclose(out["iou"], iou, rtol=1e-9)


def test_poly_roundtrip_and_rescale(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"x1": [10.0], "y1": [20.0], "x2": [110.0], "y2": [60.0]})
    )
    poly = G.bbox_to_poly(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"))
    out = df.select(
        *G.poly_bbox(poly),
        G.poly_rescale(poly, 1.5, 2.0).alias("scaled"),
    ).collect()[0]
    assert (out["x1"], out["y1"], out["x2"], out["y2"]) == (10.0, 20.0, 110.0, 60.0)
    # int() truncation semantics of the reference (polygon.py:59-69)
    assert out["scaled"][0] == [15.0, 40.0]
    assert out["scaled"][2] == [165.0, 120.0]


def test_contains_and_expand_clamp(spark):
    pdf = pd.DataFrame({
        "ax1": [10.0, 10.0], "ay1": [10.0, 10.0],
        "ax2": [20.0, 20.0], "ay2": [20.0, 20.0],
        "bx1": [0.0, 15.0], "by1": [0.0, 15.0],
        "bx2": [30.0, 30.0], "by2": [30.0, 30.0],
    })
    df = spark.createDataFrame(pdf)
    out = df.select(
        G.contains(
            F.col("ax1"), F.col("ay1"), F.col("ax2"), F.col("ay2"),
            F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2"),
        ).alias("c")
    ).toPandas()
    assert list(out["c"]) == [True, False]

    ex = G.expand_bbox(F.lit(10.0), F.lit(10.0), F.lit(20.0), F.lit(20.0), 0.1, 0.5)
    row = df.limit(1).select(*ex).collect()[0]
    assert (row["x1"], row["y1"], row["x2"], row["y2"]) == (9.0, 5.0, 21.0, 25.0)

    cl = G.clamp_bbox(F.lit(-5.0), F.lit(-5.0), F.lit(2000.0), F.lit(500.0),
                      F.lit(1024), F.lit(1024))
    row = df.limit(1).select(*cl).collect()[0]
    assert (row["x1"], row["y1"], row["x2"], row["y2"]) == (0.0, 0.0, 1024.0, 500.0)


def test_merge_and_intersect(spark):
    df = spark.range(1)
    m = G.merge_bbox(F.lit(0.0), F.lit(0.0), F.lit(10.0), F.lit(10.0),
                     F.lit(5.0), F.lit(-5.0), F.lit(20.0), F.lit(8.0))
    i = G.intersect_bbox(F.lit(0.0), F.lit(0.0), F.lit(10.0), F.lit(10.0),
                         F.lit(5.0), F.lit(-5.0), F.lit(20.0), F.lit(8.0))
    row = df.select(*m).collect()[0]
    assert (row["x1"], row["y1"], row["x2"], row["y2"]) == (0.0, -5.0, 20.0, 10.0)
    row = df.select(*i).collect()[0]
    assert (row["x1"], row["y1"], row["x2"], row["y2"]) == (5.0, 0.0, 10.0, 8.0)
