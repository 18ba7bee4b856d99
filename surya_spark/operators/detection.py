"""Text-line detection stage + relational post-processing.

The reference pipeline: segmentation model → CRAFT polygonization →
rescale → clean contained boxes → 5% y-expand → confidence normalization
(/root/reference/surya/detection/__init__.py:27-155,
 /root/reference/surya/detection/heatmap.py:43-184,
 /root/reference/surya/common/util.py:9-36).

Spark shape: the model+polygonize step is one mapInPandas slot over page
blobs (Arrow-batched, image bytes never shuffled again after this stage);
everything downstream is pure relational — the containment filter is a
LEFT ANTI self-join within a page, expansion/normalization are column
expressions and a window.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schemas
from ..functions import geometry as G
from . import slots

_DETECT_OUT = T.StructType(
    list(schemas.LINES)
    + [
        T.StructField("page_width", T.IntegerType(), False),
        T.StructField("page_height", T.IntegerType(), False),
    ]
)


def _containment_keep(x1, y1, x2, y2, ids, block_elems: int = 8_000_000):
    """Vectorized per-page containment survivor mask: drop i if some j with
    strictly larger area (area-tie → lower id) bbox-contains it, or if
    area(i) <= 0 — the shared kernel behind _postprocess_page and
    clean_contained_boxes_kernel.

    Memory guard (round-3 verdict #3): the naive n×n boolean matrix is
    ~100 MB at n=10k boxes PER PAGE, ×32 workers → executor OOM on a
    pathological page. Work proceeds in row-blocks of ≤ block_elems
    matrix cells (~8 MB of bool), so peak memory is O(block·n).

    r7 pruning: rows and columns are processed in x1-sorted order, and
    each container block only tests the columns it could possibly
    contain — a container j of box i needs x1ⱼ ≤ x1ᵢ and
    x1ᵢ < x2ᵢ ≤ x2ⱼ ≤ x1ⱼ + max_width, so for a block of containers
    with x1 ∈ [lo_x, hi_x] the candidate columns are exactly those with
    x1 ∈ [lo_x, hi_x + max_width]. With bench-shaped boxes (width ≤ 124
    over a 900-px page) that window holds ~15% of the page's boxes, so
    the per-page work drops ~7× while the evaluated predicate — and
    therefore the survivor mask — is unchanged."""
    import numpy as np

    n = x1.shape[0]
    area = (x2 - x1) * (y2 - y1)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.argsort(x1, kind="stable")
    sx1, sy1 = x1[order], y1[order]
    sx2, sy2 = x2[order], y2[order]
    sids, sarea = ids[order], area[order]
    wmax = float((sx2 - sx1).max())
    # the column-window derivation uses x1ᵢ < x2ᵢ, which inverted boxes
    # (x2 < x1, possibly positive area) violate — fall back to full-width
    # columns when any exist (never on sane detector output)
    windowed = not bool((sx2 < sx1).any())
    contained_s = np.zeros(n, dtype=bool)
    step = max(1, block_elems // max(n, 1))
    for s in range(0, n, step):
        e = min(n, s + step)
        # rows s:e are candidate CONTAINERS (x1-sorted); only columns
        # whose x1 falls in the block's reachable window can be contained
        if windowed:
            lo = int(np.searchsorted(sx1, sx1[s], side="left"))
            hi = int(np.searchsorted(sx1, sx1[e - 1] + wmax, side="right"))
        else:
            lo, hi = 0, n
        block = (
            (sx1[s:e, None] <= sx1[None, lo:hi])
            & (sy1[s:e, None] <= sy1[None, lo:hi])
            & (sx2[s:e, None] >= sx2[None, lo:hi])
            & (sy2[s:e, None] >= sy2[None, lo:hi])
            & (sids[s:e, None] != sids[None, lo:hi])
            & (
                (sarea[s:e, None] > sarea[None, lo:hi])
                | ((sarea[s:e, None] == sarea[None, lo:hi])
                   & (sids[s:e, None] < sids[None, lo:hi]))
            )
        )
        contained_s[lo:hi] |= block.any(axis=0)
    contained = np.zeros(n, dtype=bool)
    contained[order] = contained_s
    return ~(contained | (area <= 0))


def _postprocess_page(rows: list[dict], page_w: int, page_h: int,
                      y_pct: float = 0.05) -> list[dict]:
    """Fused per-page post-processing: containment clean + 5% y-expand
    clamped to the page + max-confidence normalization — numerically
    identical to clean_contained_boxes → expand_and_normalize, but run
    where the page's rows already sit (inside the detect UDF), so the
    anti-join and window shuffles disappear from the flagship plan.
    (Round-3 measurement: the shuffle-hash anti-join, required once the
    driver broadcast was banned, cost ~2 line-table shuffles per run;
    per-page work belongs in the page-grain kernel.)

    The slot's POLYGON survives: skewed minAreaRect quads from CRAFT
    output (ref surya/detection/heatmap.py:83-103) keep their corners —
    containment stays bbox-based exactly like the reference's clean_boxes
    (ref surya/common/util.py:9-36 compares PolygonBox.bbox), expansion
    is CORNERWISE by index (top corners 0,1 get −dy, bottom corners 2,3
    get +dy; ref surya/common/polygon.py:100-113 PolygonBox.expand) with
    each corner clamped to the page (fit_to_bounds, polygon.py:76-81),
    and the bbox is recomputed as the min/max of the expanded corners
    (bbox is a derived property of the polygon in the reference). Float
    arithmetic throughout — the engine's established contract; the
    reference's int() truncation in expand() is a rasterization detail
    its own crop code re-truncates anyway."""
    import numpy as np

    if not rows:
        return rows
    x1 = np.array([r["x1"] for r in rows], dtype=float)
    y1 = np.array([r["y1"] for r in rows], dtype=float)
    x2 = np.array([r["x2"] for r in rows], dtype=float)
    y2 = np.array([r["y2"] for r in rows], dtype=float)
    ids = np.array([r["line_idx"] for r in rows])
    P = np.array([r["polygon"] for r in rows], dtype=float)  # (n, 4, 2)
    keep = _containment_keep(x1, y1, x2, y2, ids)
    # vertical boxes (height >= 3x width) skip expand AND clamp, per
    # reference (parallel_get_boxes only expands/fits non-vertical boxes)
    vertical = (y2 - y1) >= 3 * (x2 - x1)
    dy = (y2 - y1) * y_pct
    ny = P[:, :, 1].copy()
    ny[:, 0:2] -= dy[:, None]
    ny[:, 2:4] += dy[:, None]
    nx = np.clip(P[:, :, 0], 0.0, float(page_w))
    ny = np.clip(ny, 0.0, float(page_h))
    nx = np.where(vertical[:, None], P[:, :, 0], nx)
    ny = np.where(vertical[:, None], P[:, :, 1], ny)
    ex1, ex2 = nx.min(axis=1), nx.max(axis=1)
    ey1, ey2 = ny.min(axis=1), ny.max(axis=1)
    conf = np.array([r["confidence"] for r in rows], dtype=float)
    cmax = conf[keep].max() if keep.any() else 1.0
    out = []
    for i, r in enumerate(rows):
        if not keep[i]:
            continue
        out.append({
            **r,
            "x1": float(ex1[i]), "y1": float(ey1[i]),
            "x2": float(ex2[i]), "y2": float(ey2[i]),
            "polygon": [[float(nx[i, j]), float(ny[i, j])]
                        for j in range(4)],
            "confidence": float(conf[i] / cmax),
        })
    return out


def detect_lines(pages: DataFrame,
                 slot: Callable = slots.surrogate_detect,
                 postprocess: bool = False) -> DataFrame:
    """page_blobs → detected lines (noisy, unordered, may contain
    duplicates). One Arrow batch of pages in, exploded lines out.
    postprocess=True fuses clean/expand/normalize per page in-UDF
    (_postprocess_page)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, w, h, blob in zip(
                pdf["media_ref"], pdf["width"], pdf["height"], pdf["img_bytes"]
            ):
                page_rows = []
                for i, d in enumerate(slot(ref, int(w), int(h), bytes(blob))):
                    poly = d["polygon"]
                    xs = [p[0] for p in poly]
                    ys = [p[1] for p in poly]
                    page_rows.append({
                        "media_ref": ref, "line_idx": i, "polygon": poly,
                        "x1": min(xs), "y1": min(ys),
                        "x2": max(xs), "y2": max(ys),
                        "confidence": d["confidence"],
                        "page_width": int(w), "page_height": int(h),
                    })
                if postprocess:
                    page_rows = _postprocess_page(page_rows, int(w), int(h))
                rows.extend(page_rows)
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {f.name: pd.Series([], dtype=object) for f in _DETECT_OUT})

    return pages.mapInPandas(run, schema=_DETECT_OUT)


def split_detect_lines(pages: DataFrame,
                       slot: Callable = slots.surrogate_detect,
                       chunk_px: int = 1400,
                       postprocess: bool = False) -> DataFrame:
    """Chunked detection for tall pages: explode each page into ≤chunk_px
    vertical slices, run the detector per slice, shift results back and
    re-stitch — the reference's vertical split + heatmap stitch
    (/root/reference/surya/detection/util.py:7-36,
     /root/reference/surya/detection/__init__.py:134-151) re-expressed as
    flatMap → infer → relational re-key. Bounds the per-item activation
    footprint no matter how tall the page is; short pages pass through as
    a single slice with zero extra cost.

    Truth lines are assigned to the slice containing their y-center, so
    stitching is a union + window re-key, not a merge heuristic."""
    import json
    import math
    import zlib

    from ..datagen import MAGIC, decode_page

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, w, h, blob in zip(
                pdf["media_ref"], pdf["width"], pdf["height"], pdf["img_bytes"]
            ):
                desc = decode_page(bytes(blob))
                page_rows = []
                n_chunks = max(1, math.ceil(int(h) / chunk_px))
                for ci in range(n_chunks):
                    y0 = ci * chunk_px
                    ch = min(chunk_px, int(h) - y0)
                    sub_lines = []
                    for ln in desc["lines"]:
                        cy = (ln["bbox"][1] + ln["bbox"][3]) / 2.0
                        if y0 <= cy < y0 + chunk_px:
                            b = ln["bbox"]
                            sub_lines.append({
                                "bbox": [b[0], b[1] - y0, b[2], b[3] - y0],
                                "text": ln["text"],
                            })
                    sub = {**desc, "h": ch, "lines": sub_lines}
                    sub_blob = MAGIC + zlib.compress(
                        json.dumps(sub, sort_keys=True).encode())
                    for i, d in enumerate(
                        slot(f"{ref}#c{ci}", int(w), ch, sub_blob)
                    ):
                        poly = [[p[0], p[1] + y0] for p in d["polygon"]]
                        xs = [p[0] for p in poly]
                        ys = [p[1] for p in poly]
                        page_rows.append({
                            "media_ref": ref,
                            "line_idx": ci * 100_000 + i,
                            "polygon": poly,
                            "x1": min(xs), "y1": min(ys),
                            "x2": max(xs), "y2": max(ys),
                            "confidence": d["confidence"],
                            "page_width": int(w), "page_height": int(h),
                        })
                if postprocess:
                    # all chunks of the page are in hand — dense re-key
                    # THEN the cross-chunk containment clean run here,
                    # replacing the stitched relational form (window
                    # re-key → anti-join) with zero shuffles; kept rows
                    # carry their pre-clean dense ids exactly like the
                    # relational path
                    page_rows.sort(key=lambda r: r["line_idx"])
                    for j, r in enumerate(page_rows):
                        r["line_idx"] = j
                    page_rows = _postprocess_page(page_rows, int(w), int(h))
                rows.extend(page_rows)
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {f.name: pd.Series([], dtype=object) for f in _DETECT_OUT})

    raw = pages.mapInPandas(run, schema=_DETECT_OUT)
    if postprocess:
        return raw  # dense re-key already done in-UDF
    # re-key line_idx densely per page (chunk-offset ids → 0..n-1)
    from pyspark.sql import Window

    w = Window.partitionBy("media_ref").orderBy("line_idx")
    return raw.withColumn(
        "line_idx", (F.row_number().over(w) - 1).cast("int")
    )


def clean_contained_boxes(lines: DataFrame) -> DataFrame:
    """Drop zero-area boxes and boxes fully contained in a larger box on the
    same page — the reference's clean_boxes
    (/root/reference/surya/common/util.py:9-36) as a LEFT ANTI self-join.

    The join is equi on media_ref (partition-prunable) with the containment
    theta refinement in the predicate; per-page line counts are O(10²) so
    the within-key quadratic term is bounded.
    """
    a, b = lines.alias("a"), lines.alias("b")
    A, B = (lambda c: F.col(f"a.{c}")), (lambda c: F.col(f"b.{c}"))
    contained = (
        (A("media_ref") == B("media_ref"))
        & (A("line_idx") != B("line_idx"))
        & G.contains(A("x1"), A("y1"), A("x2"), A("y2"),
                     B("x1"), B("y1"), B("x2"), B("y2"))
        & (
            (G.area(B("x1"), B("y1"), B("x2"), B("y2"))
             > G.area(A("x1"), A("y1"), A("x2"), A("y2")))
            | (
                (G.area(B("x1"), B("y1"), B("x2"), B("y2"))
                 == G.area(A("x1"), A("y1"), A("x2"), A("y2")))
                & (B("line_idx") < A("line_idx"))
            )
        )
    )
    # b derives from the corpus: force a shuffled hash anti-join — a
    # driver-side broadcast build would grow with corpus size (BENCH.md 7)
    kept = a.join(b.hint("shuffle_hash"), on=contained, how="left_anti")
    return kept.filter(
        G.area(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")) > 0
    )


def clean_contained_quads(lines: DataFrame,
                          poly_col: str = "polygon",
                          key: str = "media_ref",
                          id_col: str = "line_idx") -> DataFrame:
    """Quad-aware variant of clean_contained_boxes: containment and area
    use the CORNERWISE quad predicates (G.poly_contains +
    G.poly_area_shoelace) instead of bbox reductions, so skewed
    minAreaRect quads from rotated text (ref
    surya/detection/heatmap.py:83-103) keep corner accuracy — two
    diagonal slivers whose bboxes nest are not dropped here.

    Same physical shape as the bbox form: equi anti-join on the page key
    with the containment theta refinement, shuffle-hash build (the build
    side derives from the corpus). Shoelace areas of integer-cornered
    quads are exact in double, so the operator is oracle-replicable."""
    a, b = lines.alias("a"), lines.alias("b")
    pa, pb = F.col(f"b.{poly_col}"), F.col(f"a.{poly_col}")
    area_a = G.poly_area_shoelace(pb)
    area_b = G.poly_area_shoelace(pa)
    contained = (
        (F.col(f"a.{key}") == F.col(f"b.{key}"))
        & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        & G.poly_contains(pa, pb)
        & (
            (area_b > area_a)
            | ((area_b == area_a)
               & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}")))
        )
    )
    kept = a.join(b.hint("shuffle_hash"), on=contained, how="left_anti")
    return kept.filter(G.poly_area_shoelace(F.col(poly_col)) > 0)


def clean_contained_boxes_kernel(lines: DataFrame,
                                 key: str = "media_ref",
                                 id_col: str = "line_idx",
                                 dedup_ids: bool = False,
                                 output_cols: list[str] | None = None
                                 ) -> DataFrame:
    """Same semantics as clean_contained_boxes, different physical shape:
    a vectorized numpy containment sweep per page group (applyInPandas).

    Use when per-key box counts are large (≥ ~500): the anti-join's
    within-key pairwise predicate is O(n²) rows through codegen, while the
    kernel does the same O(n²) work as a single boolean matrix op. Measured
    at sf0.1 bench data (≈1200 boxes/page): 70 s (join) → ~7 s (kernel).
    For the extraction pipeline's real pages (tens of lines) the join wins
    — no Python round-trip. Pathological pages are memory-safe: the
    containment matrix is evaluated in bounded row-blocks
    (_containment_keep).

    dedup_ids=True drops duplicate (key, id_col) rows INSIDE the kernel
    (pandas keep-first) — equivalent to a dropDuplicates([key, id_col])
    upstream when duplicate ids carry identical rows (exact-duplicate
    source rows, e.g. lineitem's), but without the extra full-table
    exchange the upstream distinct would cost: the groupBy(key) shuffle
    the kernel already pays is the only one left in the plan (r7).

    output_cols trims the kernel's RETURN columns (callers that only
    need survivor keys skip shipping the geometry back through Arrow —
    r7; the survivor set is decided inside the kernel either way)."""
    cols = output_cols or lines.columns
    out_schema = (T.StructType([lines.schema[c] for c in cols])
                  if output_cols else lines.schema)

    def sweep(pdf: pd.DataFrame) -> pd.DataFrame:
        if dedup_ids:
            pdf = pdf.drop_duplicates(subset=[id_col])
        keep = _containment_keep(
            pdf["x1"].to_numpy(), pdf["y1"].to_numpy(),
            pdf["x2"].to_numpy(), pdf["y2"].to_numpy(),
            pdf[id_col].to_numpy(),
        )
        return pdf.loc[keep, cols]

    return lines.groupBy(key).applyInPandas(sweep, schema=out_schema).select(cols)


def expand_and_normalize(lines: DataFrame, y_pct: float = 0.05) -> DataFrame:
    """5% vertical expansion clamped to the page — skipped for vertical
    boxes (height ≥ 3×width), matching the reference
    (/root/reference/surya/detection/heatmap.py:170-176) — and per-page
    max-confidence normalization
    (/root/reference/surya/detection/heatmap.py:100-107) via a window.

    The POLYGON column is expanded CORNERWISE (top corners 0,1 −dy,
    bottom corners 2,3 +dy, each corner clamped to the page — ref
    surya/common/polygon.py:100-113 expand + :76-81 fit_to_bounds), so
    skewed quads keep their corners; the bbox columns are recomputed as
    corner min/max, the reference's derived-bbox semantics. Explicit
    element_at corner expressions, not transform() lambdas — higher-order
    functions evaluate interpreted (BENCH.md rule 1) and the quad has a
    known dimension of 4.

    All interdependent columns are replaced in ONE withColumns:
    sequential withColumn calls would resolve the y2 expression against
    the already-expanded y1 and double-expand the bottom edge (round-3
    bug, caught by the fused-path equivalence test)."""
    poly = F.col("polygon")
    w_pg = F.col("page_width").cast("double")
    h_pg = F.col("page_height").cast("double")
    dy = (F.col("y2") - F.col("y1")) * F.lit(y_pct)

    def clamp(v, m):
        return F.greatest(F.lit(0.0), F.least(v, m))

    def corner(i, sign):
        c = F.element_at(poly, i)
        return F.array(
            clamp(F.element_at(c, 1), w_pg),
            clamp(F.element_at(c, 2) + F.lit(float(sign)) * dy, h_pg),
        )

    vertical = (F.col("y2") - F.col("y1")) >= 3 * (F.col("x2") - F.col("x1"))
    expanded = F.when(vertical, poly).otherwise(
        F.array(corner(1, -1), corner(2, -1), corner(3, +1), corner(4, +1))
    )
    xs = [expanded[i][0] for i in range(4)]
    ys = [expanded[i][1] for i in range(4)]
    w = Window.partitionBy("media_ref")
    return (
        lines.withColumns({
            "polygon": expanded,
            "x1": F.least(*xs),
            "y1": F.least(*ys),
            "x2": F.greatest(*xs),
            "y2": F.greatest(*ys),
        })
        .withColumn(
            "confidence",
            F.col("confidence") / F.max("confidence").over(w),
        )
    )


def detection_stage(pages: DataFrame,
                    slot: Callable = slots.surrogate_detect,
                    chunked: bool = False,
                    chunk_px: int = 1400,
                    fused: bool = True) -> DataFrame:
    """Full detection stage: infer → clean → expand/normalize.
    chunked=True routes through the vertical split/stitch path (bounded
    activation memory for tall pages).

    fused=True (default) runs the per-page post-processing inside the
    detect UDF — zero extra shuffles; fused=False keeps the relational
    anti-join + window form (same output, pytest-pinned equivalent),
    useful when lines come from a source other than the detect slot."""
    if fused:
        return (
            split_detect_lines(pages, slot, chunk_px, postprocess=True)
            if chunked else detect_lines(pages, slot, postprocess=True)
        )
    detect = (
        split_detect_lines(pages, slot, chunk_px) if chunked
        else detect_lines(pages, slot)
    )
    return expand_and_normalize(clean_contained_boxes(detect))
