"""HTML text-render view (sources/render_html.py) — semantics pinned
against /root/reference/surya/debug/render_html.py render_text_as_html:
2x scaling, 0.75*min-dim font cap, vertical-text class, markup
passthrough vs escaping.
"""

from __future__ import annotations

import os

from surya_spark import datagen, pipeline
from surya_spark.sources import render_html as RH


def test_box_geometry_and_font_scaling():
    html = RH.page_html(["hello"], [[10, 20, 110, 40]], 500, 300)
    # page dims scaled 2x
    assert "width: 1000px" in html and "height: 600px" in html
    # box coords scaled 2x, int-truncated
    assert ("left: 20px; top: 40px; width: 200px; height: 40px;" in html)
    # font = min(0.75 * min(200, 40), 16) = min(30, 16) = 16
    assert "font-size: 16px;" in html
    # small box: font follows 0.75 * min dim
    html2 = RH.page_html(["x"], [[0, 0, 100, 8]], 200, 100)
    assert "font-size: 12px;" in html2  # min(0.75*16, 16) = 12


def test_vertical_class_for_tall_boxes():
    html = RH.page_html(["v", "h"],
                        [[0, 0, 10, 50], [0, 60, 100, 80]], 200, 200)
    assert 'class="text-box vertical-text" id="box-0"' in html
    assert 'class="text-box" id="box-1"' in html


def test_markup_passthrough_vs_escape():
    html = RH.page_html(
        ["<math>x^2 \\leq y</math>", "a < b & c > d"],
        [[0, 0, 100, 20], [0, 30, 100, 50]], 200, 100)
    # MathML embedded as-is for the math renderer
    assert "<math>x^2 \\leq y</math>" in html
    # plain text escaped
    assert "a &lt; b &amp; c &gt; d" in html
    assert RH.KATEX_MARKER in html


def test_render_ink_iou_semantics():
    """Render-based visual check: tag-stripped identical text scores 1.0,
    small perturbations score high-but-below-1, unrelated text scores
    low, and empty-vs-empty is defined as 1.0."""
    from surya_spark.functions.metrics import render_ink_iou

    assert render_ink_iou("<math>abc def</math>", "abc def") == 1.0
    near = render_ink_iou("abc def", "abc dxf")
    far = render_ink_iou("abc", "zzz qqq")
    assert 0.8 < near < 1.0 and far < 0.5
    assert render_ink_iou("", "<math></math>") == 1.0


def test_spark_render_and_file_sink(spark, tmp_path):
    from surya_spark.operators import detection, reading_order, recognition

    n = 6
    docs = datagen.gen_documents(spark, n, partitions=2)
    blobs = datagen.gen_page_blobs(spark, n, partitions=2)
    pages = pipeline.pages_for(docs, blobs).persist()
    ordered = reading_order.order_lines(detection.detection_stage(pages))
    ocr = recognition.recognize(
        recognition.slice_crops(
            ordered.select("media_ref", "line_idx", "position",
                           "x1", "y1", "x2", "y2", "polygon"), pages),
        emit_chars=False)
    rendered = RH.html_render_pages(ocr, pages).persist()
    rows = rendered.collect()
    assert rows
    r = max(rows, key=lambda r: r["n_lines"])
    assert r["n_lines"] > 0
    assert r["html"].count('class="text-box') == r["n_lines"]
    assert r["html"].startswith("<!DOCTYPE html>")

    out_dir = str(tmp_path / "html")
    RH.write_html(rendered, out_dir)
    files = os.listdir(out_dir)
    assert len(files) == len(rows) and all(f.endswith(".html")
                                           for f in files)
    rendered.unpersist(), pages.unpersist()
