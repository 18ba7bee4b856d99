"""Recognition stage: detection→recognition slice join + OCR slot + word
assembly.

Reference flow: detected polygons crop line slices from the page image,
slices are batched into the recognizer, chars are assembled to words/lines
(/root/reference/surya/recognition/__init__.py:138-197,501-942,
 /root/reference/surya/input/processing.py:57-101,
 /root/reference/surya/recognition/util.py:123-154).

Spark shape, designed so page bytes shuffle at most once and never fan out:
line bboxes are tiny → aggregate them per page (collect_list), join ONTO
the page blobs (one row per page, not per line), slice all of a page's
crops in a single mapInPandas pass, and explode. Downstream only small
crop blobs move. The recognizer is a second mapInPandas slot over crops;
its internal continuous-batching micro-scheduler is invisible to the plan
(SURVEY.md §7.3) — the surrogate just decodes the fixture descriptor.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schemas
from ..datagen import decode_page
from ..plans import caching
from . import slots

_CROPS = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("line_idx", T.IntegerType(), False),
    T.StructField("position", T.IntegerType(), False),
    T.StructField("x1", T.DoubleType(), False),
    T.StructField("y1", T.DoubleType(), False),
    T.StructField("x2", T.DoubleType(), False),
    T.StructField("y2", T.DoubleType(), False),
    T.StructField("crop_bytes", T.BinaryType(), False),
    T.StructField("res_x", T.DoubleType(), False),
    T.StructField("res_y", T.DoubleType(), False),
])


def slice_crops(lines: DataFrame, pages: DataFrame,
                highres_pages: DataFrame | None = None,
                null_axis_rects: bool = True) -> DataFrame:
    """lines(media_ref, line_idx, position, bbox) ⋈ page blobs → crop blobs.

    The aggregate-then-join keeps the shuffle payload to bbox lists; page
    bytes stay where the page row lives.

    If the lines carry a `polygon` column, it rides along in the box
    struct and each crop is polygon-MASKED (encode_crop's fillPoly
    analog; ref surya/input/processing.py:57-101): skewed quads from
    rotated text stop leaking neighbor-line ink into recognition.
    Axis-aligned polygons are bit-identical to the bbox-only path —
    and with null_axis_rects=True (default) they are NULLed out before
    the aggregate as a pure payload optimization (pytest-pinned
    bit-equal; the flag exists only for A/B measurement).

    With highres_pages (a second blob table of the SAME pages at higher
    resolution — the reference's 192-DPI render), crops are taken from the
    highres blob: detection bboxes (lowres space) are scaled by
    int(v * highres/lowres) exactly like the reference
    (/root/reference/surya/recognition/__init__.py:158-170), and each crop
    carries its (res_x, res_y) so recognize() can rescale model char boxes
    back into lowres page coordinates. Output bbox columns stay in lowres
    space either way. Only the small (width, height) columns of the lowres
    table join in — lowres page bytes are never read on this path
    (column pruning keeps them out of the scan)."""
    has_poly = "polygon" in lines.columns
    has_text = "input_text" in lines.columns
    box_cols = ["line_idx", "position", "x1", "y1", "x2", "y2"]
    if has_text:
        # optional per-line given text (the verify/correct library mode,
        # ref recognition/__init__.py:199-254 slice_bboxes input_text):
        # rides the box struct to the crop row so recognize() can seed
        # the decode with it
        box_cols.append("input_text")
    if has_poly and null_axis_rects:
        # Axis-aligned quads carry zero information beyond the bbox —
        # encode_crop takes the identical bbox path for them (pytest-
        # pinned bit-equal), so NULL them before the per-page aggregate:
        # 8 doubles + two levels of Arrow list offsets per line stay out
        # of collect_list, the shuffle, and the Python loop; only
        # genuinely skewed quads (rotated text) keep their corners.
        # Measured ~free at bench scale (tools/poly_payload_ab.py: 2.47
        # vs 2.47 s min over 4k docs — the zlib page decode dominates);
        # kept as shuffle-payload hygiene for the 100× regime, where the
        # boxes list is the one corpus-∝ aggregate this join ships.
        # Exact == is safe: the quad corners and the bbox are derived
        # from the same doubles in _postprocess_page (bbox = corner
        # min/max), and a false negative merely keeps the polygon.
        p = F.col("polygon")
        c1, c2, c3, c4 = (F.element_at(p, i) for i in (1, 2, 3, 4))
        is_rect = (
            (F.size(p) == 4)
            & (c1[0] == F.col("x1")) & (c1[1] == F.col("y1"))
            & (c2[0] == F.col("x2")) & (c2[1] == F.col("y1"))
            & (c3[0] == F.col("x2")) & (c3[1] == F.col("y2"))
            & (c4[0] == F.col("x1")) & (c4[1] == F.col("y2"))
        )
        lines = lines.withColumn(
            "polygon", F.when(is_rect, F.lit(None)).otherwise(p))
    if has_poly:
        box_cols.append("polygon")
    boxes = lines.groupBy("media_ref").agg(
        F.collect_list(F.struct(*box_cols)).alias("boxes")
    )
    # the boxes aggregate derives from the FULL detection output — letting
    # the optimizer broadcast it makes the driver collect and serialize
    # the whole per-page box list (a serial, size-proportional cost that
    # capped scaling efficiency; it even hit the 300 s broadcast timeout
    # at low parallelism). shuffle_hash keeps the join distributed on the
    # media_ref partitioning both sides already have.
    boxes = boxes.hint("shuffle_hash")
    if highres_pages is None:
        joined = pages.join(boxes, "media_ref", "inner").select(
            "media_ref", "img_bytes", "boxes",
            F.lit(1.0).alias("_ws"), F.lit(1.0).alias("_hs"),
        )
    else:
        lodims = pages.select(
            "media_ref",
            F.col("width").alias("_lw"), F.col("height").alias("_lh"))
        joined = (
            highres_pages.join(boxes, "media_ref", "inner")
            .join(lodims, "media_ref")
            .select(
                "media_ref", "img_bytes", "boxes",
                (F.col("width").cast("double") / F.col("_lw")).alias("_ws"),
                (F.col("height").cast("double") / F.col("_lh")).alias("_hs"),
            )
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, blob, boxes, ws, hs in zip(
                pdf["media_ref"], pdf["img_bytes"], pdf["boxes"],
                pdf["_ws"], pdf["_hs"],
            ):
                desc = decode_page(bytes(blob))
                ws, hs = float(ws), float(hs)
                for b in boxes:
                    poly = b["polygon"] if has_poly else None
                    if ws == 1.0 and hs == 1.0:
                        bbox = [b["x1"], b["y1"], b["x2"], b["y2"]]
                    else:
                        # int() truncation is the reference contract
                        bbox = [float(int(b["x1"] * ws)),
                                float(int(b["y1"] * hs)),
                                float(int(b["x2"] * ws)),
                                float(int(b["y2"] * hs))]
                        if poly is not None:
                            # PolygonBox.rescale truncates per corner
                            poly = [[float(int(p[0] * ws)),
                                     float(int(p[1] * hs))] for p in poly]
                    row = {
                        "media_ref": ref,
                        "line_idx": int(b["line_idx"]),
                        "position": int(b["position"]),
                        "x1": b["x1"], "y1": b["y1"],
                        "x2": b["x2"], "y2": b["y2"],
                        "crop_bytes": slots.encode_crop(desc, bbox, poly),
                        "res_x": ws, "res_y": hs,
                    }
                    if has_text:
                        row["input_text"] = b["input_text"]
                    rows.append(row)
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {f.name: pd.Series([], dtype=object) for f in out_schema})

    out_schema = (T.StructType(
        list(_CROPS) + [T.StructField("input_text", T.StringType(), True)])
        if has_text else _CROPS)
    return joined.mapInPandas(run, schema=out_schema)


def fused_page_crops(pages: DataFrame,
                     detect_slot: Callable = None,
                     band: float | None = None) -> DataFrame:
    """One page-grain pass for the flagship's detect→order→slice chain:
    detect slot → fused post-process (detection._postprocess_page) →
    column-aware reading order (reading_order.order_lines semantics,
    replicated per page) → crop slicing (slots.encode_crop), emitting
    the same crop rows slice_crops produces — without ever
    materializing the line table.

    Why: mapInPandas erases partitioning info, so the relational chain
    re-shuffles the line rows TWICE even though every computation is
    page-local — once for the reading-order window, once for the slice
    groupBy aggregate (+ its join back onto the pre-partitioned pages).
    This pass deletes both exchanges (round-3 lesson: per-page work
    belongs inside the page-grain UDF). The relational operators remain
    the library surface for callers that need the intermediate line
    table (given-boxes mode, checkpointed stage grain, highres); crops
    are pytest-pinned byte-identical against that path.

    Ordering contract matches order_lines exactly: two-column iff no
    line crosses the central strip (x1 < 0.48w AND x2 > 0.52w), col_id
    by center-x half, y-band floor(y1/band), position = 1-based rank by
    (col_id, y_band, x1, y1) — line_idx appended as the final tie-break
    (the relational row_number is partition-order-dependent on exact
    ties; fixtures keep keys unique).

    No highres variant: the 2x-render path needs the second blob table
    and stays on relational slice_crops."""
    from ..datagen import BAND as _BAND

    if detect_slot is None:
        detect_slot = slots.surrogate_detect
    band_v = float(_BAND) if band is None else float(band)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, w, h, blob in zip(
                pdf["media_ref"], pdf["width"], pdf["height"],
                pdf["img_bytes"],
            ):
                page_rows, _ = page_crop_rows(
                    ref, int(w), int(h), bytes(blob), detect_slot, band_v)
                rows.extend(page_rows)
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {f.name: pd.Series([], dtype=object) for f in _CROPS})

    return pages.mapInPandas(run, schema=_CROPS)


def page_crop_rows(ref: str, w: int, h: int, blob: bytes,
                   detect_slot: Callable, band_v: float,
                   desc=None, hr_blob: bytes | None = None,
                   hr_scale: tuple[float, float] | None = None
                   ) -> tuple[list[dict], object]:
    """Per-page kernel of fused_page_crops (detect slot → fused
    post-process → column-aware order → crop encode). ONE implementation
    shared by fused_page_crops and the combined single-decode pass
    (operators/fused.fused_all_crops) so the paths cannot drift — the
    repo's fusion-parity convention.

    Returns (crop row dicts, decoded page or the desc passed in): a
    caller running several page-grain kernels hands the returned desc to
    the next kernel and the blob is zlib-decoded at most once per page.
    desc stays None when no line survives post-processing (the decode is
    lazy — pages with no text never pay it).

    hr_blob + hr_scale=(ws, hs) select the dual-DPI path (r7, VERDICT
    r06 #3): detection runs on the LOWRES blob as always, crops are
    encoded from the HIGHRES descriptor with bbox and polygon rescaled
    by int() truncation per the reference
    (/root/reference/surya/recognition/__init__.py:158-170,
    surya/common/polygon.py rescale) — exactly slice_crops'
    highres kernel — and rows carry (res_x, res_y) = (ws, hs) while the
    output bbox columns stay in lowres space. The LOWRES desc is never
    decoded here on that path (the table kernel decodes it if needed)."""
    import math

    from . import detection as _det

    wd = float(w)
    page_rows = []
    for i, d in enumerate(detect_slot(ref, int(w), int(h), blob)):
        poly = d["polygon"]
        xs = [p[0] for p in poly]
        ys = [p[1] for p in poly]
        page_rows.append({
            "media_ref": ref, "line_idx": i, "polygon": poly,
            "x1": min(xs), "y1": min(ys),
            "x2": max(xs), "y2": max(ys),
            "confidence": d["confidence"],
        })
    page_rows = _det._postprocess_page(page_rows, int(w), int(h))
    if not page_rows:
        return [], desc
    crossing = any(
        r["x1"] < wd * 0.48 and r["x2"] > wd * 0.52
        for r in page_rows)
    half = wd / 2.0
    page_rows.sort(key=lambda r: (
        0 if crossing or (r["x1"] + r["x2"]) / 2.0 < half
        else 1,
        math.floor(r["y1"] / band_v),
        r["x1"], r["y1"], r["line_idx"],
    ))
    if hr_blob is None:
        if desc is None:
            desc = decode_page(blob)
        enc_desc = desc
        ws = hs = 1.0
    else:
        enc_desc = decode_page(hr_blob)
        ws, hs = float(hr_scale[0]), float(hr_scale[1])
    rows = []
    for pos, r in enumerate(page_rows, start=1):
        if hr_blob is None:
            bbox = [r["x1"], r["y1"], r["x2"], r["y2"]]
            poly = r["polygon"]
        else:
            # int() truncation is the reference contract (slice_crops'
            # highres kernel does the identical rescale)
            bbox = [float(int(r["x1"] * ws)), float(int(r["y1"] * hs)),
                    float(int(r["x2"] * ws)), float(int(r["y2"] * hs))]
            poly = ([[float(int(p[0] * ws)), float(int(p[1] * hs))]
                     for p in r["polygon"]]
                    if r["polygon"] is not None else None)
        rows.append({
            "media_ref": ref,
            "line_idx": int(r["line_idx"]),
            "position": pos,
            "x1": r["x1"], "y1": r["y1"],
            "x2": r["x2"], "y2": r["y2"],
            "crop_bytes": slots.encode_crop(enc_desc, bbox, poly),
            "res_x": ws, "res_y": hs,
        })
    return rows, desc


_OCR_OUT = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("line_idx", T.IntegerType(), False),
    T.StructField("position", T.IntegerType(), False),
    T.StructField("x1", T.DoubleType(), False),
    T.StructField("y1", T.DoubleType(), False),
    T.StructField("x2", T.DoubleType(), False),
    T.StructField("y2", T.DoubleType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("chars", T.ArrayType(schemas.TEXT_CHAR), False),
    T.StructField("confidence", T.DoubleType(), False),
])


def _continuous_schedule(blobs: list, tasks: list, step_slot,
                         n_slots: int,
                         min_prefill_ratio: float = 0.2,
                         max_steps: int = 100_000,
                         texts: list | None = None) -> list[dict]:
    """The reference's continuous-batching prediction loop
    (/root/reference/surya/recognition/__init__.py:501-607) with
    IN-FLIGHT SLOT REPLACEMENT, model-free: n_slots decoder slots; when
    the empty-slot fraction exceeds min_prefill_ratio and items wait,
    prefill admits them into the free slots; otherwise one step advances
    every in-flight sequence, and a finished sequence frees its slot
    IMMEDIATELY for the next admission — short sequences never wait for
    the longest one in their batch, which is the whole point vs padded
    fixed batches. Items should arrive width-descending (the admission
    order the caller's sort provides). Returns results in input order.

    max_steps bounds a slot implementation that never reports done —
    the scheduler-side analog of the reference's batch_max_tokens cap
    (a real deployment's step() should ALSO self-limit per sequence)."""
    from collections import deque

    n = len(blobs)
    queue = deque(range(n))
    slots_arr: list = [None] * n_slots  # (item_idx, state) or None
    results: list = [None] * n
    steps = 0
    while queue or any(s is not None for s in slots_arr):
        if steps > max_steps:
            raise RuntimeError(
                f"continuous scheduler exceeded max_steps={max_steps}; "
                "the step slot is not finishing sequences")
        steps += 1
        empty = [b for b, s in enumerate(slots_arr) if s is None]
        if queue and (len(empty) / n_slots) > min_prefill_ratio:
            admit = [queue.popleft()
                     for _ in range(min(len(empty), len(queue)))]
            if texts is None:
                states = step_slot.prefill([blobs[i] for i in admit],
                                           [tasks[i] for i in admit])
            else:
                states = step_slot.prefill([blobs[i] for i in admit],
                                           [tasks[i] for i in admit],
                                           [texts[i] for i in admit])
            for b, i, st in zip(empty, admit, states):
                slots_arr[b] = (i, st)
            continue
        active = [(b, i, st) for b, s in enumerate(slots_arr)
                  if s is not None for i, st in [s]]
        done = step_slot.step([st for _, _, st in active])
        for d, (b, i, st) in zip(done, active):
            if d:
                results[i] = step_slot.result(st)
                slots_arr[b] = None
    return results


def recognize(crops: DataFrame,
              slot: Callable = slots.surrogate_recognize,
              task: str = "ocr_with_boxes",
              emit_chars: bool = True,
              batch_slot: Callable | None = None,
              micro_batch: int = 64,
              step_slot=None,
              rec_slots: int = 64) -> DataFrame:
    """crop blobs → ocr_lines. Width-descending sort within partitions
    mirrors the reference's batch admission order
    (/root/reference/surya/recognition/__init__.py:847-854) — a physical
    optimization only; result order is re-pinned by explicit keys.

    task: per-stage decode mode (a plan-time parameter, not data — same as
    the reference's TaskNames routing, recognition/__init__.py:86-102). A
    per-row 'task' column on crops overrides it.

    emit_chars=False prunes per-char boxes INSIDE the UDF — Catalyst can
    prune the output column but not the Python work that builds it, and
    char structs are ~20× the rows of lines (measured: the single biggest
    cost of the whole pipeline at sf-scale). Callers that don't consume
    chars (the span-assembly flagship) must pass False.

    batch_slot: continuous-batching analog for GPU recognizers (ref
    recognition/__init__.py:501-607). When set, the UDF feeds the slot
    micro_batch-sized slices of the width-DESCENDING row stream —
    same-width crops decode together, so a padded-tensor recognizer
    wastes minimal padding, and each finished micro-batch immediately
    admits the next-widest crops (the reference's admission policy; the
    in-flight sequence replacement it adds on top only matters for a
    shared KV cache, which per-batch decoding doesn't keep). Signature:
    batch_slot(blobs: list[bytes], tasks: list[str]) -> list[dict], one
    result dict per input in order.

    step_slot: the FULL continuous-batching analog with in-flight slot
    replacement (_continuous_schedule; ref prediction_loop,
    recognition/__init__.py:501-607) — a prefill/step/result object
    (slots.SurrogateStepRecognizer documents the contract); rec_slots =
    the decoder slot count (the reference's recognition_batch_size).
    Mutually exclusive with batch_slot; per-row outputs are pinned
    byte-identical to the plain path across slot schedules.

    input_text conditioning (ref recognition/__init__.py:86-102,354-471;
    behavior contract = ref tests/test_recognition.py:17-38): when crops
    carry an `input_text` column (threaded by slice_crops /
    recognize_given_boxes), each slot is called with a third argument —
    slot(blob, task, input_text); batch/step slots get a texts list. A
    slot result carrying original_text_good=True (the reference's
    empty-decode short-circuit for verified-good given text, :889-899)
    resolves to the CALLER'S text with chars=[] and confidence 1.0, and
    the output grows an `original_text_good` boolean column so verify
    workflows can filter on it. Without the column, signatures and
    schema are unchanged — every existing 2-arg slot keeps working."""
    if batch_slot is not None and step_slot is not None:
        raise ValueError("pass at most one of batch_slot / step_slot")
    sorted_crops = crops.sortWithinPartitions((F.col("x2") - F.col("x1")).desc())
    has_task_col = "task" in crops.columns
    has_input = "input_text" in crops.columns
    # optional language hints ride through unchanged (the reference's
    # OCR results carry per-result language lists surfaced via
    # functions/languages.py, mirroring ref recognition/languages.py) —
    # tail-first optional column like task/input_text, so existing
    # callers and slots are untouched when absent
    has_langs = "langs" in crops.columns

    has_res = "res_x" in crops.columns
    extra_fields = []
    if has_input:
        extra_fields.append(
            T.StructField("original_text_good", T.BooleanType(), False))
    if has_langs:
        extra_fields.append(
            T.StructField("langs", T.ArrayType(T.StringType()), True))
    out_schema = (T.StructType(list(_OCR_OUT) + extra_fields)
                  if extra_fields else _OCR_OUT)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            n = len(pdf)
            tasks = pdf["task"] if has_task_col else [task] * n
            rxs = pdf["res_x"] if has_res else [1.0] * n
            rys = pdf["res_y"] if has_res else [1.0] * n
            texts = ([None if t is None else str(t)
                      for t in pdf["input_text"]] if has_input
                     else [None] * n)
            if batch_slot is not None:
                blobs = [bytes(b) for b in pdf["crop_bytes"]]
                tlist = list(tasks)
                results: list[dict] = []
                for s in range(0, n, micro_batch):
                    if has_input:
                        results.extend(
                            batch_slot(blobs[s:s + micro_batch],
                                       tlist[s:s + micro_batch],
                                       texts[s:s + micro_batch]))
                    else:
                        results.extend(
                            batch_slot(blobs[s:s + micro_batch],
                                       tlist[s:s + micro_batch]))
            elif step_slot is not None:
                results = _continuous_schedule(
                    [bytes(b) for b in pdf["crop_bytes"]], list(tasks),
                    step_slot, rec_slots,
                    texts=texts if has_input else None)
            else:
                results = None
            for i, (ref, li, pos, x1, y1, x2, y2, blob, tk, rx, ry) in \
                    enumerate(zip(
                        pdf["media_ref"], pdf["line_idx"], pdf["position"],
                        pdf["x1"], pdf["y1"], pdf["x2"], pdf["y2"],
                        pdf["crop_bytes"], tasks, rxs, rys,
                    )):
                if results is not None:
                    r = results[i]
                elif has_input:
                    r = slot(bytes(blob), tk, texts[i])
                else:
                    r = slot(bytes(blob), tk)
                rx, ry = float(rx), float(ry)
                otg = bool(r.get("original_text_good", False))
                # rescale chars from (possibly highres) crop space by
                # res_scales, shift into page coords, clamp to the line bbox
                # (/root/reference/surya/recognition/__init__.py:906-914)
                chars = [
                    {
                        "text": c["text"],
                        "x1": min(max(c["x1"] / rx + x1, x1), x2),
                        "y1": min(max(c["y1"] / ry + y1, y1), y2),
                        "x2": min(max(c["x2"] / rx + x1, x1), x2),
                        "y2": min(max(c["y2"] / ry + y1, y1), y2),
                        "confidence": c["confidence"],
                        "bbox_valid": bool(c["bbox_valid"]),
                    }
                    for c in r["chars"]
                ] if emit_chars else []
                row = {
                    "media_ref": ref, "line_idx": int(li), "position": int(pos),
                    "x1": x1, "y1": y1, "x2": x2, "y2": y2,
                    # verified-good given text resolves to the caller's
                    # original (the reference returns "" + the flag and
                    # callers keep their text; the relational contract
                    # resolves it in place)
                    "text": (texts[i] or "").strip() if otg else r["text"],
                    "chars": chars,
                    "confidence": 1.0 if otg else r["confidence"],
                }
                if has_input:
                    row["original_text_good"] = otg
                if has_langs:
                    lv = pdf["langs"].iloc[i]
                    row["langs"] = None if lv is None else [
                        str(c) for c in lv]
                rows.append(row)
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {f.name: pd.Series([], dtype=object) for f in out_schema})

    return sorted_crops.mapInPandas(run, schema=out_schema)


def recognize_given_boxes(boxes: DataFrame, pages: DataFrame,
                          slot: Callable = slots.surrogate_recognize,
                          task: str = "ocr_with_boxes",
                          emit_chars: bool = True) -> DataFrame:
    """The parity-critical library mode: caller supplies line bboxes and
    skips detection (/root/reference/surya/recognition/__init__.py:773-942
    with bboxes=; used by the recognition benchmark and LaTeX OCR).
    boxes: (media_ref, line_idx, x1, y1, x2, y2[, position][, input_text]).

    An optional `input_text` column is the reference's verify/correct
    mode (input_text= kwarg, ref :783-853): per-line given text seeds
    the decode; lines whose text the model confirms come back with the
    original text, confidence 1.0 and original_text_good=true (see
    recognize).

    An optional `polygon` column is the reference's polygons= input
    (slice_polys_from_image, ref recognition/__init__.py:199-254):
    skewed quads mask their crops exactly as on the detection path;
    axis-aligned quads are bit-identical to the bbox form."""
    if "position" not in boxes.columns:
        w = Window.partitionBy("media_ref").orderBy("y1", "x1", "line_idx")
        boxes = boxes.withColumn("position", F.row_number().over(w))
    cols = ["media_ref", "line_idx", "position", "x1", "y1", "x2", "y2"]
    for opt in ("polygon", "input_text"):
        if opt in boxes.columns:
            cols.append(opt)
    crops = slice_crops(boxes.select(*cols), pages)
    return recognize(crops, slot, task, emit_chars=emit_chars)


def recognize_blocks(pages: DataFrame,
                     slot: Callable = slots.surrogate_recognize) -> DataFrame:
    """LaTeX-OCR entry: the whole page is one box, decoded in
    block_without_boxes mode → <math>-wrapped text
    (/root/reference/ocr_latex.py, scripts/ocr_latex.py:23-31)."""
    boxes = pages.select(
        "media_ref",
        F.lit(0).alias("line_idx"),
        F.lit(1).alias("position"),
        F.lit(0.0).alias("x1"), F.lit(0.0).alias("y1"),
        F.col("width").cast("double").alias("x2"),
        F.col("height").cast("double").alias("y2"),
    )
    crops = slice_crops(boxes, pages)
    return recognize(crops, slot, task="block_without_boxes")


def drop_repeated_lines(ocr_lines: DataFrame, window: int = 40) -> DataFrame:
    """The reference's drop_repeated_text=True post-check
    (/root/reference/surya/recognition/__init__.py:643-655, pinned by ref
    tests/test_recognition.py:41-56): a line whose decoded stream has
    degenerated into a short loop — detect_repeat_token over the char
    stream, the decode-side image of the token loop (util.py:59-69) —
    is blanked (text '', confidence 0.0,
    chars []) instead of shipping garbage downstream. Pure column
    expressions over the line table; no shuffle, no Python."""
    from ..functions.text import detect_repeat_token

    # chars-as-tokens: the relational stand-in for the decoder's token-id
    # stream (a looping id stream IS a looping char stream after decode)
    toks = F.array_remove(F.split(F.col("text"), ""), "")
    rep = detect_repeat_token(toks, window)
    cols = {
        "text": F.when(rep, F.lit("")).otherwise(F.col("text")),
        "confidence": F.when(rep, F.lit(0.0)).otherwise(F.col("confidence")),
    }
    if "chars" in ocr_lines.columns:
        # slice(chars, 1, 0) = typed empty array (array() would be void)
        cols["chars"] = F.when(rep, F.slice("chars", 1, 0)) \
            .otherwise(F.col("chars"))
    return ocr_lines.withColumns(cols)


def line_confidence(ocr_lines: DataFrame) -> DataFrame:
    """Line confidence = mean of char confidences
    (/root/reference/surya/recognition/__init__.py:901-905) as an array
    aggregate — no shuffle, no Python.

    Deliberate exception to the no-HOF rule (CLAUDE.md #1): char arrays
    are short (≤ ~100 per line) and per-LINE, so the interpreted fold
    costs O(chars) once per row; the codegen alternative
    (posexplode → groupBy avg → join back) adds a full shuffle + join,
    which loses below ~10⁴ chars/line. The rule targets per-PAIR hot
    paths (dot products, pairwise geometry) where the fold runs n² times."""
    n = F.size("chars")
    s = F.aggregate(
        "chars", F.lit(0.0), lambda acc, c: acc + c["confidence"]
    )
    return ocr_lines.withColumn(
        "confidence", F.when(n > 0, s / n).otherwise(F.col("confidence"))
    )


def dedupe_close_chars(ocr_lines: DataFrame, tol: float = 0.1) -> DataFrame:
    """Drop consecutive chars whose bboxes coincide within tol px —
    multi-token characters decode to repeated boxes in the reference
    (clean_close_polygons, /root/reference/surya/recognition/util.py:100-120).
    Lag-window formulation over exploded chars; rebuilt nested."""
    ex = ocr_lines.select(
        "media_ref", "line_idx",
        F.posexplode("chars").alias("pos", "ch"),
    )
    w = Window.partitionBy("media_ref", "line_idx").orderBy("pos")
    close = (
        (F.abs(F.col("ch.x1") - F.lag("ch.x1").over(w)) < tol)
        & (F.abs(F.col("ch.y1") - F.lag("ch.y1").over(w)) < tol)
        & (F.abs(F.col("ch.x2") - F.lag("ch.x2").over(w)) < tol)
        & (F.abs(F.col("ch.y2") - F.lag("ch.y2").over(w)) < tol)
        & (F.col("ch.text") == F.lag("ch.text").over(w))
    )
    kept = ex.withColumn("_dup", F.coalesce(close, F.lit(False))).filter(
        ~F.col("_dup"))
    rebuilt = kept.groupBy("media_ref", "line_idx").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "ch"))),
            lambda s: s["ch"],
        ).alias("chars")
    )
    return (
        ocr_lines.drop("chars")
        .join(rebuilt, ["media_ref", "line_idx"], "left")
        .withColumn("chars", F.coalesce("chars", F.array()))
    )


def attach_words(ocr_lines: DataFrame) -> DataFrame:
    """The reference's return_words=True output shape (words_from_chars,
    ref surya/recognition/util.py:123-154, attached per line at
    recognition/__init__.py:925-927): adds a `words` array column —
    assemble_words re-nested at line grain, ordered by word_idx. Lines
    with no chars (emit_chars=False upstream, or whitespace-only) get an
    empty array. One media_ref-keyed shuffle for the group + join; the
    words side derives from the corpus, so shuffle_hash, never a driver
    broadcast. ocr_lines feeds BOTH the words aggregate and the probe
    side of the join (rule 2) — managed-persist it so the recognition
    UDF lineage executes once, released at the first terminal action."""
    ocr_lines = caching.managed(ocr_lines)
    words = assemble_words(ocr_lines)
    nested = words.groupBy("media_ref", "line_idx").agg(
        F.array_sort(
            F.collect_list(F.struct("word_idx", "word",
                                    "x1", "y1", "x2", "y2"))
        ).alias("words"))
    empty = F.array().cast(nested.schema["words"].dataType)
    return (
        ocr_lines.join(nested.hint("shuffle_hash"),
                       ["media_ref", "line_idx"], "left")
        .withColumn("words", F.coalesce("words", empty))
    )


def assemble_words(ocr_lines: DataFrame) -> DataFrame:
    """chars → words: split on whitespace chars, word bbox = running union.
    Relational form of /root/reference/surya/recognition/util.py:123-154:
    posexplode chars, cumulative space count = word id, group.
    Returns (media_ref, line_idx, word_idx, word, x1, y1, x2, y2)."""
    ex = ocr_lines.select(
        "media_ref", "line_idx",
        F.posexplode("chars").alias("pos", "ch"),
    )
    w = Window.partitionBy("media_ref", "line_idx").orderBy("pos")
    is_space = F.col("ch.text").rlike(r"^\s$").cast("int")
    with_ids = ex.withColumn(
        "word_id", F.sum(is_space).over(w) - is_space
    ).filter(~F.col("ch.text").rlike(r"^\s$"))
    return (
        with_ids.groupBy("media_ref", "line_idx", "word_id")
        .agg(
            F.concat_ws(
                "", F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", F.col("ch.text").alias("t")))
                    ),
                    lambda s: s["t"],
                )
            ).alias("word"),
            F.min("ch.x1").alias("x1"), F.min("ch.y1").alias("y1"),
            F.max("ch.x2").alias("x2"), F.max("ch.y2").alias("y2"),
        )
        .withColumnRenamed("word_id", "word_idx")
    )
