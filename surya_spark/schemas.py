"""Explicit StructTypes for every stage table (SURVEY.md §1.3).

The reference validates shapes with pydantic models
(/root/reference/surya/common/polygon.py:13-38,
 /root/reference/surya/recognition/schema.py:10-40,
 /root/reference/surya/layout/schema.py:8-17,
 /root/reference/surya/table_rec/schema.py:8-48); we declare the same
shapes once as Spark StructTypes — schema inference is never used.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- documents
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# page blobs: media bytes + machine-readable ground truth (fixture pages
# carry their own truth, mirroring /root/reference/tests/conftest.py:50-75)
PAGE_BLOBS = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("img_bytes", T.BinaryType(), False),
    ]
)

# ---------------------------------------------------------------- geometry
# polygon = 4 clockwise corners [[x,y],...] like
# /root/reference/surya/common/polygon.py:9-57; bbox materialized flat for
# predicate pushdown / codegen.
POLYGON = T.ArrayType(T.ArrayType(T.DoubleType()))

LINES = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("line_idx", T.IntegerType(), False),
        T.StructField("polygon", POLYGON, False),
        T.StructField("x1", T.DoubleType(), False),
        T.StructField("y1", T.DoubleType(), False),
        T.StructField("x2", T.DoubleType(), False),
        T.StructField("y2", T.DoubleType(), False),
        T.StructField("confidence", T.DoubleType(), False),
    ]
)

TEXT_CHAR = T.StructType(
    [
        T.StructField("text", T.StringType(), False),
        T.StructField("x1", T.DoubleType(), False),
        T.StructField("y1", T.DoubleType(), False),
        T.StructField("x2", T.DoubleType(), False),
        T.StructField("y2", T.DoubleType(), False),
        T.StructField("confidence", T.DoubleType(), False),
        T.StructField("bbox_valid", T.BooleanType(), False),
    ]
)

OCR_LINES = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("line_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("chars", T.ArrayType(TEXT_CHAR), False),
        T.StructField("confidence", T.DoubleType(), False),
    ]
)

# layout regions: 17-class label set of the reference
# (/root/reference/surya/layout/model/config.py:16-34)
LAYOUT_LABELS = [
    "Blank", "Text", "TextInlineMath", "Code", "SectionHeader", "Caption",
    "Footnote", "Equation", "ListItem", "PageFooter", "PageHeader",
    "Picture", "Figure", "Table", "Form", "TableOfContents", "Handwriting",
]

REGIONS = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("emit_idx", T.IntegerType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("x1", T.DoubleType(), False),
        T.StructField("y1", T.DoubleType(), False),
        T.StructField("x2", T.DoubleType(), False),
        T.StructField("y2", T.DoubleType(), False),
        T.StructField("confidence", T.DoubleType(), False),
        T.StructField("top_k", T.MapType(T.StringType(), T.DoubleType()), False),
    ]
)

# table structure: rows/cols emitted per table crop, cells = row∩col grid
# (/root/reference/surya/table_rec/schema.py:8-48)
TABLE_ITEMS = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("table_idx", T.IntegerType(), False),
        T.StructField("item_kind", T.StringType(), False),  # 'row' | 'col' | 'spanning_cell'
        T.StructField("item_id", T.IntegerType(), False),
        T.StructField("x1", T.DoubleType(), False),
        T.StructField("y1", T.DoubleType(), False),
        T.StructField("x2", T.DoubleType(), False),
        T.StructField("y2", T.DoubleType(), False),
        T.StructField("is_header", T.BooleanType(), False),
        T.StructField("colspan", T.IntegerType(), True),
        T.StructField("rowspan", T.IntegerType(), True),
    ]
)

OUT_SPANS = DOCUMENTS  # same contract: (doc_id, spans) with the invariant
