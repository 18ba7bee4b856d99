"""Spanning-cell assignment: merged cells collapse to one anchor with the
widened bbox, covered grid positions disappear, text lands on the anchor
(/root/reference/surya/table_rec/__init__.py:313-327 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from surya_spark import datagen, pipeline
from surya_spark.operators import (
    detection, layout, reading_order, recognition, tables)

N = 80  # enough docs that several tables carry a merge


def test_spanning_cells_end_to_end(spark):
    docs = datagen.gen_documents(spark, N, partitions=4)
    blobs = datagen.gen_page_blobs(spark, N, partitions=4)
    pages = pipeline.pages_for(docs, blobs).persist()
    regions = layout.layout_stage(pages)
    crops = tables.table_crops(regions, pages)
    items = tables.table_items(crops)
    cells = tables.apply_spanning_cells(tables.cell_grid(items), items)

    merged = cells.filter((F.col("colspan") > 1) | (F.col("rowspan") > 1))
    assert merged.count() > 0, "fixture should produce some merged tables"
    assert merged.filter(F.col("rowspan") > 1).count() > 0
    # anchor bbox spans exactly colspan×rowspan cells (100×40 px grid)
    bad = merged.filter(
        (F.col("x2") - F.col("x1") != F.col("colspan") * 100.0)
        | (F.col("y2") - F.col("y1") != F.col("rowspan") * 40.0)
    )
    assert bad.count() == 0

    # no (row, col) appears twice, and covered positions are gone
    dup = cells.groupBy("media_ref", "table_idx", "row_id", "col_id") \
        .count().filter("count > 1")
    assert dup.count() == 0

    # text assignment: merged text lands once, on the anchor
    ocr = recognition.recognize(recognition.slice_crops(
        reading_order.order_lines(detection.detection_stage(pages))
        .select("media_ref", "line_idx", "position", "x1", "y1", "x2", "y2"),
        pages,
    ))
    with_text = tables.assign_cell_text(cells, ocr)
    m = with_text.filter(
        (F.col("colspan") > 1) | (F.col("rowspan") > 1)).collect()
    assert m and all(r["text"][0] in "mv" and "_merged" in r["text"]
                     for r in m)
