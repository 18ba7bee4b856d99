"""Debug overlay sink (sources/debug_draw.py) — the engine's analog of
the reference's draw_polys_on_image / draw_bboxes_on_image
(/root/reference/surya/debug/draw.py): numpy rasterization, label font,
minimal PNG encode, and the Spark per-page overlay operator + file sink.
"""

from __future__ import annotations

import os

import numpy as np

from surya_spark import datagen, pipeline
from surya_spark.sources import debug_draw as D


RED = (255, 0, 0)


def test_poly_outline_paints_expected_pixels():
    arr = np.full((20, 20, 3), 255, dtype=np.uint8)
    D.draw_polys_on_array(arr, [[[2, 2], [10, 2], [10, 10], [2, 10]]],
                          color=RED)
    red = np.array(RED, dtype=np.uint8)
    # corners + edge midpoints painted
    for y, x in [(2, 2), (2, 6), (2, 10), (6, 10), (10, 10), (10, 2), (6, 2)]:
        assert (arr[y, x] == red).all(), (y, x)
    # interior and exterior untouched
    assert (arr[6, 6] == 255).all() and (arr[15, 15] == 255).all()


def test_bbox_form_matches_poly_form():
    a = np.full((30, 30, 3), 255, dtype=np.uint8)
    b = np.full((30, 30, 3), 255, dtype=np.uint8)
    D.draw_bboxes_on_array(a, [[3, 4, 12, 9]], color=RED)
    D.draw_polys_on_array(b, [[[3, 4], [12, 4], [12, 9], [3, 9]]], color=RED)
    assert (a == b).all()
    assert (a != 255).any()


def test_labels_render_on_white_backing():
    arr = np.full((40, 60, 3), 200, dtype=np.uint8)  # grey page
    D.draw_polys_on_array(arr, [[[5, 5], [50, 5], [50, 30], [5, 30]]],
                          labels=["text"], color=RED)
    # backing box is pure white, glyph pixels are the outline color
    backing = arr[5:11, 5:21]
    assert (backing == 255).all(axis=2).any()
    assert (backing == np.array(RED)).all(axis=2).any()


def test_png_roundtrip_bitexact():
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, (13, 17, 3)).astype(np.uint8)
    png = D.encode_png(arr)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    back = D.decode_png_rgb(png)
    assert back.shape == arr.shape and (back == arr).all()


def test_spark_overlays_and_file_sink(spark, tmp_path):
    from surya_spark.operators import detection

    n = 6
    docs = datagen.gen_documents(spark, n, partitions=2)
    blobs = datagen.gen_page_blobs(spark, n, partitions=2)
    pages = pipeline.pages_for(docs, blobs).persist()
    lines = detection.detection_stage(pages)
    overlays = D.debug_overlays(lines, pages).persist()
    rows = overlays.collect()
    assert rows and all(bytes(r["png"])[:8] == b"\x89PNG\r\n\x1a\n"
                        for r in rows)
    # painted pixels exist and scale with the item count
    r = max(rows, key=lambda r: r["n_items"])
    img = D.decode_png_rgb(bytes(r["png"]))
    assert img.shape == (r["height"], r["width"], 3)
    n_red = int((img == np.array(RED)).all(axis=2).sum())
    assert r["n_items"] > 0 and n_red >= 4 * r["n_items"]

    out_dir = str(tmp_path / "pngs")
    D.write_pngs(overlays, out_dir)
    files = sorted(os.listdir(out_dir))
    assert len(files) == len(rows) and all(f.endswith(".png") for f in files)
    with open(os.path.join(out_dir, files[0]), "rb") as fh:
        assert fh.read(8) == b"\x89PNG\r\n\x1a\n"
    overlays.unpersist(), pages.unpersist()


def test_region_overlay_with_labels(spark):
    from surya_spark.operators import layout

    n = 4
    docs = datagen.gen_documents(spark, n, partitions=2)
    blobs = datagen.gen_page_blobs(spark, n, partitions=2)
    pages = pipeline.pages_for(docs, blobs).persist()
    regions = layout.layout_stage_tiled(pages)
    overlays = D.debug_overlays(regions, pages, label_col="label")
    rows = overlays.collect()
    assert rows and all(r["n_items"] > 0 for r in rows)
    img = D.decode_png_rgb(bytes(rows[0]["png"]))
    assert ((img != 255).any(axis=2)).sum() > 0
    pages.unpersist()
