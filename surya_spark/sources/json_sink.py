"""Results sink: out_spans → newline-JSON grouped per document.

Reference CLIs group predictions by filename and dump results.json
(/root/reference/surya/scripts/ocr_text.py:56-65). At corpus scale a
single driver-side json.dump is impossible; the distributed equivalent is
one JSON object per line per document, written in parallel. The Iceberg
out_spans table remains the primary sink — this is the export view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def results_view(out_spans: DataFrame) -> DataFrame:
    """Adds per-media 1-based page numbering like the reference sink:
    page_idx = dense rank of media_ref within the doc's span order."""
    exploded = out_spans.select(
        "doc_id", F.posexplode("spans").alias("i", "s")
    )
    return (
        exploded.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.size(
                F.array_distinct(
                    F.filter(
                        F.collect_list(F.col("s.media_ref")),
                        lambda m: m.isNotNull(),
                    )
                )
            ).alias("n_media"),
            F.array_sort(
                F.collect_list(F.struct(F.col("i"), F.col("s")))
            ).alias("_tmp"),
        )
        .select(
            "doc_id", "n_spans", "n_media",
            F.transform("_tmp", lambda t: t["s"]).alias("spans"),
        )
    )


def write_results_json(out_spans: DataFrame, path: str,
                       n_files: int | None = None) -> None:
    df = results_view(out_spans)
    if n_files:
        df = df.coalesce(n_files)
    df.write.mode("overwrite").json(path)
