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


def test_order_lines_with_separators(spark):
    import pandas as pd

    from surya_spark.operators import reading_order

    # 3-column page: separators at x=340 and x=680
    lines = spark.createDataFrame(pd.DataFrame(
        [("m", 0, 700.0, 100.0, 800.0, 120.0, 1024),   # col 2, top
         ("m", 1, 10.0, 500.0, 200.0, 520.0, 1024),    # col 0, bottom
         ("m", 2, 10.0, 100.0, 200.0, 120.0, 1024),    # col 0, top
         ("m", 3, 350.0, 100.0, 600.0, 120.0, 1024)],  # col 1
        columns=["media_ref", "line_idx", "x1", "y1", "x2", "y2",
                 "page_width"]))
    seps = spark.createDataFrame(pd.DataFrame(
        [("m", 0, 338.0, 50.0, 342.0, 900.0),
         ("m", 1, 678.0, 50.0, 682.0, 900.0)],
        columns=["media_ref", "seg_id", "x1", "y1", "x2", "y2"]))
    out = reading_order.order_lines_with_separators(lines, seps)
    order = [r["line_idx"] for r in out.orderBy("position").collect()]
    assert order == [2, 1, 3, 0]  # col0 top→bottom, then col1, then col2


def test_layout_tile_presplit_matches_whole_page(spark):
    """Tall (>1500px) pages are exploded into ≤4 tiles, the layout slot runs
    per tile, and stitch+merge must reproduce the whole-page regions exactly
    (ref surya/layout/slicer.py:19-140). Also checks the width-sliced and
    pass-through (small page) paths."""
    from surya_spark import datagen
    from surya_spark.operators import layout

    def page(ref, w, h, regions):
        desc = {"w": w, "h": h, "lines": [], "table": None,
                "regions": regions}
        return (ref, w, h, datagen.encode_page(desc))

    pages = spark.createDataFrame(
        [
            page("blob://t/tall", 1024, 4096, [
                {"label": "SectionHeader", "bbox": [60, 28, 600, 60],
                 "order": 0},
                {"label": "Text", "bbox": [60, 100, 964, 3900], "order": 1},
                {"label": "Picture", "bbox": [100, 3950, 900, 4090],
                 "order": 2},
            ]),
            page("blob://t/wide", 4096, 1024, [
                {"label": "Table", "bbox": [100, 100, 3900, 900],
                 "order": 0},
            ]),
            page("blob://t/small", 1024, 1024, [
                {"label": "SectionHeader", "bbox": [60, 28, 600, 60],
                 "order": 0},
                {"label": "Text", "bbox": [60, 100, 964, 900], "order": 1},
            ]),
        ],
        "media_ref string, width int, height int, img_bytes binary",
    )

    def key(df):
        return {
            (r["media_ref"], r["label"], r["x1"], r["y1"], r["x2"], r["y2"])
            for r in df.collect()
        }

    whole = key(layout.layout_stage(pages))
    tiled_df = layout.layout_stage_tiled(pages)
    tiled = key(tiled_df)
    assert tiled == whole

    # the tall page really was split (>1 tile before the merge)
    pre = layout.split_layout_regions(pages)
    n_tiles = (pre.filter("media_ref = 'blob://t/tall'")
               .select("tile_idx").distinct().count())
    assert n_tiles >= 3
    # and the small page passed through as a single tile
    assert (pre.filter("media_ref = 'blob://t/small'")
            .select("tile_idx").distinct().count()) == 1
