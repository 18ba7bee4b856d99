"""Span re-assembly: stage tables → out_spans(doc_id, spans) satisfying the
per-row invariant (kind, text, media_ref, order).

Replaces the reference's slice_map / table_counts offset bookkeeping
(/root/reference/surya/recognition/__init__.py:176,880-885,
 /root/reference/surya/scripts/table_recognition.py:62,79-96) with keyed
joins: every item carries (doc_id, span offset, sub_order) and the final
order is one grouped array sort — no positional arithmetic anywhere.

Contract per input span, in offset order:
  kind='text'  → passes through unchanged (already-extracted content is
                 preserved, mirroring original_text_good=True passthrough at
                 /root/reference/surya/recognition/__init__.py:889-899)
  kind='image' → passes through (opaque figure media)
  kind='page'  → one 'text' span per OCR line in reading order
  kind='table' → 'text' spans for lines outside the table grid, then one
                 'cell' span per grid cell in row-major order
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_spans(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id",
        F.explode("spans").alias("s"),
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


def media_spans(span_rows: DataFrame) -> DataFrame:
    return span_rows.filter(F.col("kind").isin("page", "table", "image"))


def free_lines(ocr_lines: DataFrame, cells: DataFrame | None) -> DataFrame:
    """OCR lines not claimed by any table cell (center-containment anti-join)."""
    if cells is None:
        return ocr_lines
    ln = ocr_lines.alias("l")
    cl = cells.alias("c")
    lcx = (F.col("l.x1") + F.col("l.x2")) / 2
    lcy = (F.col("l.y1") + F.col("l.y2")) / 2
    pred = (
        (F.col("l.media_ref") == F.col("c.media_ref"))
        & (lcx >= F.col("c.x1")) & (lcx < F.col("c.x2"))
        & (lcy >= F.col("c.y1")) & (lcy < F.col("c.y2"))
    )
    # cells are data-derived: keep the anti-join a shuffled hash join
    return ln.join(cl.hint("shuffle_hash"), on=pred, how="left_anti")


def assemble_spans(documents: DataFrame, ocr_lines: DataFrame,
                   cells: DataFrame | None = None) -> DataFrame:
    """→ out_spans(doc_id, spans array<struct<kind,text,media_ref,offset>>)."""
    span_rows = explode_spans(documents)

    passthrough = span_rows.filter(F.col("kind").isin("text", "image")).select(
        "doc_id", "offset",
        F.lit(0).cast("long").alias("sub_order"),
        "kind", "text", "media_ref",
    )

    # derived from the full documents table — shuffle-hash, never a
    # driver-built broadcast (serial cost ∝ corpus size)
    media = media_spans(span_rows).select(
        "doc_id", "offset", "media_ref").hint("shuffle_hash")

    # packing invariant: line sub_orders live in [0, 1e6), cell sub_orders
    # in [1e6, ...) with 1000 columns per row — guarded at runtime because
    # silent violation would mis-order spans, not fail
    line_order = F.when(
        F.col("position") < 1_000_000, F.col("position").cast("long")
    ).otherwise(F.raise_error(
        "assemble_spans: line position >= 1e6 breaks span packing"
    ).cast("long"))
    lines = (
        free_lines(ocr_lines, cells)
        .select(
            "media_ref",
            line_order.alias("sub_order"),
            F.lit("text").alias("kind"), "text",
        )
    )

    # lines and cells both resolve to (media_ref, sub_order, kind, text):
    # union FIRST, then ONE media join — half the join stages of the
    # per-stream formulation, and the sub_order ranges are disjoint by
    # the packing invariant so the union is conflict-free
    staged = lines
    if cells is not None:
        cell_order = F.when(
            (F.col("col_id") < 1000) & (F.col("row_id") < 1_000_000_000),
            (F.lit(1_000_000) + F.col("row_id") * 1000 + F.col("col_id"))
            .cast("long"),
        ).otherwise(F.raise_error(
            "assemble_spans: table exceeds 1000 cols / 1e9 rows packing bound"
        ).cast("long"))
        cell_items = cells.select(
            "media_ref",
            cell_order.alias("sub_order"),
            F.lit("cell").alias("kind"), "text",
        )
        staged = staged.unionByName(cell_items)

    items = passthrough.unionByName(
        staged.join(media, "media_ref").select(
            "doc_id", "offset", "sub_order", "kind", "text", "media_ref",
        )
    )

    # single groupBy: collect (offset, sub_order)-keyed structs, sort
    # inside the array, re-number with the transform index. One exchange
    # on doc_id — the window+row_number formulation costs an extra
    # partition-wide sort pass for identical semantics ((offset,
    # sub_order) is unique per doc, so array_sort's struct ordering is a
    # total order).
    return (
        items.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("offset", "sub_order",
                             "kind", "text", "media_ref")
                )
            ).alias("_s")
        )
        .select(
            "doc_id",
            F.transform(
                "_s",
                lambda s, i: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    i.cast("int").alias("offset"),
                ),
            ).alias("spans"),
        )
    )
