"""End-to-end extraction pipeline: documents + page blobs → out_spans.

The flagship dataflow (SURVEY.md §7.2), all DataFrame ops:

    explode spans ─► media spans ⋈ page_blobs ─► pages
    pages ─► detect slot ─► clean anti-join ─► expand/normalize ─► order
    ordered lines ⋈ pages ─► crops ─► recognize slot ─► ocr_lines
    pages ─► layout slot ─► regions ─► table crops ─► table slot ─► cells
    ocr_lines ∪ cells ∪ passthrough spans ─► assemble ─► out_spans

Skew note: all heavy stages are keyed by media_ref (page grain), so an
image-heavy document's pages spread across executors automatically — the
doc-level skew the reference handles with cost-based batch packing
(/root/reference/surya/detection/__init__.py:73-90) never concentrates on
one task. The only doc_id-grain shuffle is the final assembly groupBy,
whose payload is small text spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import assemble, detection, layout, reading_order, recognition
from .operators import slots, tables


def pages_for(documents: DataFrame, page_blobs: DataFrame) -> DataFrame:
    """Media spans joined to their blobs. media_ref is unique per page, so
    this is a plain equi-join; blobs are the big side and stay put."""
    refs = (
        assemble.explode_spans(documents)
        .filter(F.col("kind").isin("page", "table"))
        .select("media_ref")
    )
    return page_blobs.join(refs, "media_ref", "left_semi")


def extract(
    documents: DataFrame,
    page_blobs: DataFrame,
    with_tables: bool = True,
    detect_slot=slots.surrogate_detect,
    recognize_slot=slots.surrogate_recognize,
    layout_slot=slots.surrogate_layout,
    table_slot=slots.surrogate_table,
) -> DataFrame:
    pages = pages_for(documents, page_blobs)

    lines = detection.detection_stage(pages, detect_slot)
    ordered = reading_order.order_lines(lines)

    crops = recognition.slice_crops(
        ordered.select("media_ref", "line_idx", "position",
                       "x1", "y1", "x2", "y2"),
        pages,
    )
    ocr_lines = recognition.recognize(crops, recognize_slot)

    cells = None
    if with_tables:
        regions = layout.layout_stage(pages, layout_slot)
        cells = tables.table_stage(regions, pages, ocr_lines, table_slot)

    return assemble.assemble_spans(documents, ocr_lines, cells)
