"""Layout stage: region labeling + reading position + header/footer rule.

Reference: DonutSwin encoder + autoregressive decoder emits ≤100 boxes in
reading order with top-5 label distributions
(/root/reference/surya/layout/__init__.py:111-226). The model step is one
mapInPandas slot; the header/footer re-label rule
(/root/reference/surya/layout/__init__.py:162-174) and position windowing
are pure expressions.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schemas
from . import slots

_LAYOUT_OUT = T.StructType(
    list(schemas.REGIONS)
    + [
        T.StructField("page_width", T.IntegerType(), False),
        T.StructField("page_height", T.IntegerType(), False),
    ]
)


def layout_regions(pages: DataFrame,
                   slot: Callable = slots.surrogate_layout) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, w, h, blob in zip(
                pdf["media_ref"], pdf["width"], pdf["height"], pdf["img_bytes"]
            ):
                for d in slot(ref, int(w), int(h), bytes(blob)):
                    rows.append({
                        "media_ref": ref, **d,
                        "page_width": int(w), "page_height": int(h),
                    })
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {f.name: pd.Series([], dtype=object) for f in _LAYOUT_OUT})

    return pages.mapInPandas(run, schema=_LAYOUT_OUT)


def relabel_headers_footers(regions: DataFrame) -> DataFrame:
    """PageHeader/PageFooter predicted in the middle 60% of the page take
    their second-best label (/root/reference/surya/layout/__init__.py:162-174).
    The top_k map makes this a pure expression: second-best = the top_k key
    with max prob among keys ≠ current label."""
    cy = (F.col("y1") + F.col("y2")) / 2.0
    in_middle = (cy > F.col("page_height") * 0.2) & (
        cy < F.col("page_height") * 0.8
    )
    entries = F.map_entries("top_k")
    second_best = F.get(
        F.array_sort(
            F.filter(entries, lambda e: e["key"] != F.col("label")),
            lambda a, b: F.when(a["value"] > b["value"], -1)
            .when(a["value"] < b["value"], 1)
            .otherwise(0),
        ),
        0,
    )["key"]
    hf = F.col("label").isin("PageHeader", "PageFooter")
    return regions.withColumn(
        "label",
        F.when(hf & in_middle, second_best).otherwise(F.col("label")),
    )


def position_regions(regions: DataFrame) -> DataFrame:
    """Reading-order position pinned to explicit keys: model emit order,
    tie-broken by geometry (/root/reference/surya/layout/__init__.py:196-209)."""
    w = Window.partitionBy("media_ref").orderBy("emit_idx", "y1", "x1")
    return regions.withColumn("position", F.row_number().over(w))


def stitch_positions(tiled: DataFrame,
                     key: str = "media_ref",
                     tile_col: str = "tile_idx",
                     emit_col: str = "emit_idx") -> DataFrame:
    """Slicer re-join: regions decoded per tile get global reading-order
    positions by offsetting each tile's emit indices with the cumulative
    count of earlier tiles (/root/reference/surya/layout/slicer.py:89-116).
    One window, no Python."""
    # cumulative emitted-before-this-tile count
    counts = tiled.groupBy(key, tile_col).agg(
        F.count(F.lit(1)).alias("_n_tile"))
    w_cum = Window.partitionBy(key).orderBy(tile_col).rowsBetween(
        Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("_n_tile").over(w_cum), F.lit(0)))
    return (
        tiled.join(offsets.select(key, tile_col, "_offset"),
                   [key, tile_col])
        .withColumn("position",
                    (F.col(emit_col) + F.col("_offset") + 1).cast("int"))
        .drop("_offset")
    )


def layout_stage(pages: DataFrame,
                 slot: Callable = slots.surrogate_layout) -> DataFrame:
    return position_regions(relabel_headers_footers(layout_regions(pages, slot)))
