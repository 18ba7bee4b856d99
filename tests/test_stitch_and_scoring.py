"""Position stitching, close-char dedup, fuzzy overlap score, provider."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from surya_spark.functions import metrics
from surya_spark.operators import recognition, slots
from surya_spark.operators.layout import stitch_positions


def test_stitch_positions(spark):
    tiled = spark.createDataFrame(pd.DataFrame(
        [("m", 0, 0), ("m", 0, 1), ("m", 1, 0), ("m", 1, 1), ("m", 2, 0)],
        columns=["media_ref", "tile_idx", "emit_idx"]))
    out = {(r["tile_idx"], r["emit_idx"]): r["position"]
           for r in stitch_positions(tiled).collect()}
    assert out == {(0, 0): 1, (0, 1): 2, (1, 0): 3, (1, 1): 4, (2, 0): 5}


def test_dedupe_close_chars(spark):
    ch = lambda t, x: {"text": t, "x1": x, "y1": 0.0, "x2": x + 5.0,
                       "y2": 10.0, "confidence": 1.0, "bbox_valid": True}
    ocr = spark.createDataFrame(pd.DataFrame({
        "media_ref": ["m"], "line_idx": [0], "text": ["aab"],
        "chars": [[ch("a", 0.0), ch("a", 0.05), ch("b", 10.0)]],
        "confidence": [1.0],
    }))
    out = recognition.dedupe_close_chars(ocr).collect()[0]
    assert [c["text"] for c in out["chars"]] == ["a", "b"]


def test_fuzzy_overlap_score(spark):
    pred = spark.createDataFrame(pd.DataFrame(
        [("p", 0, "hello world"), ("p", 1, "completely different")],
        columns=["key", "line_id", "text"]))
    ref = spark.createDataFrame(pd.DataFrame(
        [("p", 0, "hello world"), ("p", 1, "another line")],
        columns=["key", "line_id", "text"]))
    r = metrics.fuzzy_overlap_score(pred, ref).collect()[0]
    assert r["n_lines"] == 2
    assert 0.5 < r["mean_score"] < 1.0  # one exact + one weak match


def test_model_provider_lazy_singleton():
    calls = []

    def loader(path):
        calls.append(path)
        return {"model": path}

    p1 = slots.ModelProvider("ckpt://det", loader)
    p2 = slots.ModelProvider("ckpt://det", loader)
    assert p1.get() is p2.get()
    assert calls == ["ckpt://det"]  # loaded exactly once per process

    with pytest.raises(NotImplementedError):
        slots.render_pdf_pages(b"%PDF-1.4")
