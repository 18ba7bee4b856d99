"""fused_all_crops parity: the flagship's combined single-decode page
pass must emit exactly the union of what the two single-purpose fused
passes emit — recognition crops byte-identical to fused_page_crops,
table crops byte-identical to fused_table_crops — and pipeline.extract
on the combined path must produce the same spans as before."""

from __future__ import annotations

from surya_spark import datagen, pipeline
from surya_spark.operators import fused, recognition, slots, tables


def _line_rows(df):
    return sorted(
        (r["media_ref"], r["line_idx"], r["position"],
         r["x1"], r["y1"], r["x2"], r["y2"],
         bytes(r["crop_bytes"]), r["res_x"], r["res_y"])
        for r in df.collect()
    )


def _table_rows(df):
    return sorted(
        (r["media_ref"], r["table_idx"], r["x1"], r["y1"], r["x2"],
         r["y2"], bytes(r["crop_bytes"]))
        for r in df.collect()
    )


def test_fused_all_crops_byte_identical_to_single_passes(spark):
    n = 24  # includes tall (tiled-layout) pages at this count
    docs = datagen.gen_documents(spark, n, partitions=2)
    blobs = datagen.gen_page_blobs(spark, n, partitions=2)
    pages = pipeline.pages_for(docs, blobs).persist()

    for detect_slot in (slots.surrogate_detect,
                        slots.surrogate_detect_heatmap):
        allc = fused.fused_all_crops(pages, detect_slot).persist()
        lines = _line_rows(fused.line_crops(allc))
        tcrops = _table_rows(fused.table_crops(allc))
        assert lines == _line_rows(
            recognition.fused_page_crops(pages, detect_slot))
        assert tcrops == _table_rows(tables.fused_table_crops(pages))
        assert len(lines) > 0 and len(tcrops) > 0, detect_slot.__name__
        allc.unpersist()
    pages.unpersist()


def test_extract_spans_match_across_paths(spark):
    """End-to-end: the combined-pass extract equals the checkpoint-grain
    relational formulation span for span (the invariant tuple is
    (kind, text, media_ref, order))."""
    import tempfile

    n = 12
    docs = datagen.gen_documents(spark, n, partitions=2)
    blobs = datagen.gen_page_blobs(spark, n, partitions=2)

    combined = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                      for s in r["spans"]]
        for r in pipeline.extract(docs, blobs, with_tables=True).collect()
    }
    with tempfile.TemporaryDirectory() as td:
        relational = {
            r["doc_id"]: [(s["kind"], s["text"], s["media_ref"],
                           s["offset"]) for s in r["spans"]]
            for r in pipeline.checkpointed_extract(
                spark, docs, blobs, td, n_buckets=4, n_groups=2
            ).collect()
        }
    assert combined == relational and len(combined) == n


def test_fused_highres_byte_identical_to_relational(spark):
    """r7 (VERDICT r06 #3): the dual-DPI combined pass — both blob tables
    joined on media_ref, line crops encoded from the 2× render with
    reference int-truncation rescaling — must emit line crops
    BYTE-identical to the relational highres chain (detection_stage →
    order_lines → slice_crops(highres_pages=…)) and table crops
    byte-identical to the lowres fused table pass."""
    from pyspark.sql import functions as F

    from surya_spark.operators import detection, reading_order

    n = 24
    docs = datagen.gen_documents(spark, n, partitions=2)
    blobs = datagen.gen_page_blobs(spark, n, partitions=2)
    hi = datagen.gen_page_blobs(spark, n, partitions=2, scale=2.0)
    pages = pipeline.pages_for(docs, blobs).persist()
    hp = pipeline.pages_for(docs, hi).persist()

    paired = pages.join(
        hp.select("media_ref",
                  F.col("img_bytes").alias("hr_bytes"),
                  F.col("width").alias("hr_width"),
                  F.col("height").alias("hr_height")),
        "media_ref")
    allc = fused.fused_all_crops(paired, highres=True).persist()

    ordered = reading_order.order_lines(detection.detection_stage(pages))
    rel = recognition.slice_crops(
        ordered.select("media_ref", "line_idx", "position",
                       "x1", "y1", "x2", "y2", "polygon"),
        pages, highres_pages=hp)

    fused_lines = _line_rows(fused.line_crops(allc))
    assert fused_lines == _line_rows(rel)
    assert len(fused_lines) > 0
    assert all(t[-2] == 2.0 and t[-1] == 2.0 for t in fused_lines)
    assert _table_rows(fused.table_crops(allc)) == _table_rows(
        tables.fused_table_crops(pages))
    allc.unpersist(); pages.unpersist(); hp.unpersist()


def test_extract_highres_no_page_blob_persist(spark):
    """r7: the dual-DPI extract runs the fused plan — NO InMemoryRelation
    may hold raw page blobs (img_bytes/hr_bytes); only the tagged crop
    union persists. (The pre-r7 highres branch pinned full pages — the
    pipeline's largest cache footprint.)"""
    n = 12
    docs = datagen.gen_documents(spark, n, partitions=2)
    blobs = datagen.gen_page_blobs(spark, n, partitions=2)
    hi = datagen.gen_page_blobs(spark, n, partitions=2, scale=2.0)
    out = pipeline.extract(docs, blobs, with_tables=True, highres_blobs=hi)
    plan = out._jdf.queryExecution().executedPlan().toString()
    chunks = plan.split("InMemoryRelation")
    assert len(chunks) > 1, "expected the crop-union persist"
    for chunk in chunks[1:]:
        cols = chunk.split("\n", 1)[0]
        assert "img_bytes" not in cols and "hr_bytes" not in cols, cols
