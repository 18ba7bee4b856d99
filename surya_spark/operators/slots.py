"""The four pluggable inference slots (SURVEY.md §2.8).

The reference binds models via BasePredictor subclasses
(/root/reference/surya/common/predictor.py:9-57); our equivalent extension
surface is a plain callable per slot with a published contract, injected
into the stage builders. Tests and this sandbox use deterministic
fixture-backed surrogates that decode the SPG1 page descriptors; a GPU
deployment swaps in torch-backed callables with identical signatures —
the Spark plan does not change.

Surrogate realism: detection emits *noisy, unordered, duplicated* boxes so
the relational post-processing (containment anti-join, y-expand, confidence
normalization, reading-order sort) is actually load-bearing, exactly like
the CRAFT polygonization output the reference cleans up
(/root/reference/surya/detection/heatmap.py:43-184).
"""

from __future__ import annotations

import json
import zlib

from ..datagen import MAGIC, SEED, _seed, decode_page

CROP_MAGIC = b"SPC1"

_RS = None  # per-process reusable RandomState (lazily built post-fork)


def _rng(*parts):
    """Same md5-derived legacy stream as datagen._rng, but reseeding ONE
    reused RandomState instead of constructing one per call — construction
    pays a SeedSequence init that measured 65x slower than .seed() and was
    53% of the fused page kernel's profile. Safe ONLY because every caller
    in this module fully consumes the returned rng before the next _rng
    call; never use this where two rngs are live at once (datagen keeps
    the constructing form for exactly that reason)."""
    global _RS
    if _RS is None:
        import numpy as np

        _RS = np.random.RandomState(0)
    _RS.seed(_seed(*parts))
    return _RS


# ------------------------------------------------------------------ detection
def surrogate_detect(media_ref: str, width: int, height: int,
                     img_bytes: bytes) -> list[dict]:
    """Emit one 4-corner polygon per visible text line, plus noise:
    deterministic ±2px jitter, shuffled emission order, and ~25% spurious
    fully-contained duplicate boxes (lower confidence)."""
    desc = decode_page(img_bytes)
    truth = list(desc["lines"])
    rng = _rng(SEED, "det", media_ref)
    order = rng.permutation(len(truth))
    out = []
    for emit_i, ti in enumerate(order):
        ln = truth[int(ti)]
        x1, y1, x2, y2 = (float(v) for v in ln["bbox"])
        jr = _rng(SEED, "detjit", media_ref, int(ti))
        jx1, jy1, jx2, jy2 = (float(j) for j in jr.randint(-2, 3, 4))
        bx1, by1 = x1 + jx1, y1 + jy1
        bx2, by2 = max(bx1 + 1.0, x2 + jx2), max(by1 + 1.0, y2 + jy2)
        conf = float(0.6 + 0.4 * jr.rand())
        poly = [[bx1, by1], [bx2, by1], [bx2, by2], [bx1, by2]]
        out.append({"polygon": poly, "confidence": conf})
        if jr.rand() < 0.25:  # spurious contained duplicate
            w, h = bx2 - bx1, by2 - by1
            dx1, dy1 = bx1 + 0.2 * w, by1 + 0.2 * h
            dx2, dy2 = bx2 - 0.2 * w, by2 - 0.2 * h
            out.append({
                "polygon": [[dx1, dy1], [dx2, dy1], [dx2, dy2], [dx1, dy2]],
                "confidence": conf * 0.5,
            })
    return out


def surrogate_detect_heatmap(media_ref: str, width: int, height: int,
                             img_bytes: bytes) -> list[dict]:
    """Detect surrogate that exercises the REAL CRAFT polygonization path
    (functions/imageops.py): paint each truth line's bbox onto a float
    heatmap at a deterministic intensity, then recover polygons via
    dynamic thresholds → connected components → dilation → min-area rect
    — the exact pixel pipeline the reference runs on model output
    (/root/reference/surya/detection/heatmap.py:27-107). Boxes come back
    dilated by the CC buffer (±1+int(sqrt(line_height)) px), which the
    downstream stages must absorb exactly as they absorb real CRAFT
    output."""
    import numpy as np

    from ..functions import imageops as I

    desc = decode_page(img_bytes)
    heat = np.zeros((int(height), int(width)))
    for i, ln in enumerate(desc["lines"]):
        x1, y1, x2, y2 = (int(v) for v in ln["bbox"])
        heat[max(0, y1):y2, max(0, x1):x2] = 0.7 + 0.05 * (i % 5)
    boxes, confs = I.detect_boxes_from_heatmap(heat, 0.6, 0.3)
    return [
        {"polygon": [[float(x), float(y)] for x, y in box],
         "confidence": float(c)}
        for box, c in zip(boxes, confs)
    ]


# ---------------------------------------------------------------- crop encode
def _is_axis_rect(polygon, bbox, eps: float = 1e-9) -> bool:
    """polygon == the clockwise corner rectangle of bbox."""
    if polygon is None or len(polygon) != 4:
        return polygon is None
    x1, y1, x2, y2 = bbox
    rect = [[x1, y1], [x2, y1], [x2, y2], [x1, y2]]
    return all(
        abs(float(p[0]) - r[0]) <= eps and abs(float(p[1]) - r[1]) <= eps
        for p, r in zip(polygon, rect)
    )


def encode_crop(desc: dict, bbox: list[float],
                polygon: list[list[float]] | None = None) -> bytes:
    """Slice a page descriptor to a crop blob: truth lines overlapping the
    crop ≥50% of their area, coordinates shifted to crop space.

    With a non-rectangular polygon (skewed quad from rotated text), the
    visibility rule is the descriptor analog of the reference's fillPoly
    masking (/root/reference/surya/input/processing.py:57-101): pixels
    outside the polygon are padded away, so a truth line counts as
    visible by the fraction of its area covered by the polygon RASTER
    (imageops.fill_poly_mask), not by the bbox — neighbor-line ink in
    the bbox corners of a skewed crop no longer leaks in. Axis-aligned
    polygons take the exact float bbox path (bit-identical to the
    polygon-less call).

    Degenerate polygons (< 3 corners — a raster can't be filled) fall
    back to the unmasked bbox path rather than an all-false mask that
    would silently drop every truth line, matching slice_and_pad_poly /
    the reference's polygon validation short-circuit
    (/root/reference/surya/common/polygon.py:17-35)."""
    cx1, cy1, cx2, cy2 = bbox
    masked = (polygon is not None and len(polygon) >= 3
              and not _is_axis_rect(polygon, bbox))
    mask = None
    if masked:
        import math

        import numpy as np

        from ..functions.imageops import fill_poly_mask

        cw = int(math.ceil(cx2 - cx1))
        ch = int(math.ceil(cy2 - cy1))
        # Arrow delivers array<array<double>> as an object array of
        # arrays — normalize corner-by-corner
        shifted = np.array(
            [[float(p[0]) - cx1, float(p[1]) - cy1] for p in polygon])
        mask = fill_poly_mask(ch, cw, shifted)
    kept = []
    for ln in desc["lines"]:
        lx1, ly1, lx2, ly2 = ln["bbox"]
        area = (lx2 - lx1) * (ly2 - ly1)
        if area < 1e-9:
            area = 1e-9
        if not masked:
            # conditional expressions instead of max()/min() builtins:
            # this loop runs per (crop, line) in the flagship's fused
            # kernel and the builtin-call overhead was visible in its
            # profile (r7); identical float arithmetic
            ix = (lx2 if lx2 < cx2 else cx2) - (lx1 if lx1 > cx1 else cx1)
            iy = (ly2 if ly2 < cy2 else cy2) - (ly1 if ly1 > cy1 else cy1)
            visible = ix * iy if (ix > 0.0 and iy > 0.0) else 0.0
        else:
            import math

            a = max(0, int(math.floor(lx1 - cx1)))
            b = min(mask.shape[1], int(math.ceil(lx2 - cx1)))
            c = max(0, int(math.floor(ly1 - cy1)))
            d = min(mask.shape[0], int(math.ceil(ly2 - cy1)))
            visible = float(mask[c:d, a:b].sum()) if (b > a and d > c) else 0.0
        if visible / area >= 0.5:
            kept.append({
                "bbox": [lx1 - cx1, ly1 - cy1, lx2 - cx1, ly2 - cy1],
                "text": ln["text"],
            })
    payload = {"crop": [0.0, 0.0, cx2 - cx1, cy2 - cy1], "lines": kept}
    # insertion order IS sorted order for every dict here ("crop"<"lines",
    # "bbox"<"text"), so dropping sort_keys produces byte-identical JSON
    # without the per-key sort; level-1 deflate halves the kernel's
    # compression time (blob bytes differ from level-6 but every
    # producer/consumer pair — fused and relational alike — shares this
    # one encoder, and no oracle hashes crop blobs) (r7, profiled)
    return CROP_MAGIC + zlib.compress(
        json.dumps(payload).encode(), 1)


def decode_crop(blob: bytes) -> dict:
    if not blob.startswith(CROP_MAGIC):
        raise ValueError("not an SPC1 crop blob")
    return json.loads(zlib.decompress(blob[len(CROP_MAGIC):]))


# ---------------------------------------------------------------- recognition
# per-task generation budget (ref RecognitionPredictor.tasks max_tokens,
# /root/reference/surya/recognition/__init__.py:86-102) — also the bound
# above which supplied input text is dropped as likely invalid
TASK_MAX_TOKENS = {
    "ocr_with_boxes": 224,
    "ocr_without_boxes": 224,
    "block_without_boxes": 768,
}


def surrogate_recognize(crop_bytes: bytes,
                        task: str = "ocr_with_boxes",
                        input_text: str | None = None) -> dict:
    """crop blob → (text, chars, confidence). Picks the truth line covering
    the largest share of the crop; chars get evenly-divided boxes, like the
    reference's per-token bbox head output
    (/root/reference/surya/recognition/__init__.py:609-771).

    Tasks mirror /root/reference/surya/common/surya/schema.py:1-11:
      ocr_with_boxes     — text + char boxes (default)
      ocr_without_boxes  — text only; char bboxes marked invalid
      block_without_boxes— whole-block decode, output wrapped <math>…</math>
                           (the LaTeX OCR mode, scripts/ocr_latex.py:23-31)

    input_text (the "given text, verify/correct" library mode): optional
    per-line text that seeds the decode, per the reference contract —
    prepare_input coerces None→"" and DROPS text longer than the task's
    max_tokens as likely invalid (recognition/__init__.py:281-287; the
    pinned behavior of ref tests/test_recognition.py:17-38, where a
    400-char input must not change output or cost). When the conditioned
    decode confirms the given text, the model emits no new tokens and
    the reference returns TextLine(text="", chars=[], confidence=1,
    original_text_good=True) (recognition/__init__.py:889-899) — the
    surrogate mirrors that short-circuit exactly: given text equal to
    the decoded line returns the empty/flagged result; anything else
    decodes normally (flag absent/False)."""
    cond = (input_text or "").strip()
    if len(cond) > TASK_MAX_TOKENS.get(task, 224):
        cond = ""
    desc = decode_crop(crop_bytes)
    _, _, cw, ch = desc["crop"]
    best, best_cover = None, -1.0
    for ln in desc["lines"]:
        x1, y1, x2, y2 = ln["bbox"]
        ix = max(0.0, min(x2, cw) - max(x1, 0.0))
        iy = max(0.0, min(y2, ch) - max(y1, 0.0))
        if ix * iy > best_cover:
            best, best_cover = ln, ix * iy
    if best is None:
        return {"text": "", "chars": [], "confidence": 0.0}
    text = best["text"]
    if task == "block_without_boxes" and not text.startswith("<math>"):
        text = f"<math>{text}</math>"
    if cond and cond == text:
        # input text is good — no new tokens decoded (ref :889-899)
        return {"text": "", "chars": [], "confidence": 1.0,
                "original_text_good": True}
    x1, y1, x2, y2 = best["bbox"]
    n = max(1, len(text))
    cw_char = (x2 - x1) / n
    rng = _rng(SEED, "rec", text)
    conf = float(0.9 + 0.1 * rng.rand())
    boxes_valid = task == "ocr_with_boxes"
    chars = [
        {
            "text": text[i],
            "x1": x1 + i * cw_char, "y1": y1,
            "x2": x1 + (i + 1) * cw_char, "y2": y2,
            "confidence": conf, "bbox_valid": boxes_valid,
        }
        for i in range(len(text))
    ]
    return {"text": text, "chars": chars, "confidence": conf}


def surrogate_recognize_batch(blobs: list[bytes],
                              tasks: list[str],
                              texts: list[str | None] | None = None
                              ) -> list[dict]:
    """Batch-signature recognizer for the continuous-batching path
    (recognition.recognize(batch_slot=...)): one result per input, in
    order. A GPU deployment replaces the loop with a single padded-tensor
    forward pass over the (width-sorted) micro-batch — the padding waste
    bound is what the width-descending admission buys
    (ref /root/reference/surya/recognition/__init__.py:501-607).
    texts: optional per-item input_text (None = unconditioned), the
    batch analog of RecognitionPrompt.text (ref :354-371)."""
    if texts is None:
        texts = [None] * len(blobs)
    return [surrogate_recognize(b, t, x)
            for b, t, x in zip(blobs, tasks, texts)]


class SurrogateStepRecognizer:
    """Step-wise recognizer surrogate for the continuous-batching
    scheduler (recognition._continuous_schedule; ref
    /root/reference/surya/recognition/__init__.py:501-607). The
    three-callable contract a GPU deployment fills with real tensors:

      prefill(blobs, tasks[, texts]) -> list[state]
                                             # encoder pass + KV-cache
                                             # rows for newly admitted;
                                             # texts = optional per-item
                                             # input_text conditioning
                                             # (ref RecognitionPrompt.text)
      step(states) -> list[done: bool]       # ONE decoder step for the
                                             # in-flight batch, each
                                             # state advances one token
      result(state) -> result dict           # detokenize a finished seq

    The surrogate decodes the whole crop at prefill and replays it one
    character per step, so sequence lengths (and therefore slot
    lifetimes) match the text the batch path produces — the scheduler's
    output must be byte-identical to the per-crop path, pytest-pinned.
    Call counters expose the step count for the padding-waste test."""

    def __init__(self):
        self.prefill_calls = 0
        self.step_calls = 0

    def prefill(self, blobs: list[bytes], tasks: list[str],
                texts: list[str | None] | None = None) -> list[dict]:
        self.prefill_calls += 1
        if texts is None:
            texts = [None] * len(blobs)
        return [{"r": surrogate_recognize(b, t, x), "pos": 0}
                for b, t, x in zip(blobs, tasks, texts)]

    def step(self, states: list[dict]) -> list[bool]:
        self.step_calls += 1
        done = []
        for st in states:
            st["pos"] += 1
            done.append(st["pos"] >= len(st["r"]["text"]))
        return done

    def result(self, state: dict) -> dict:
        return state["r"]


# --------------------------------------------------------------------- layout
def surrogate_layout(media_ref: str, width: int, height: int,
                     img_bytes: bytes) -> list[dict]:
    """Emit layout regions in reading order with a deterministic top-5
    label distribution (/root/reference/surya/layout/__init__.py:176-177)."""
    from ..schemas import LAYOUT_LABELS

    desc = decode_page(img_bytes)
    out = []
    for r in sorted(desc.get("regions", []), key=lambda r: r["order"]):
        rng = _rng(SEED, "layout", media_ref, r["order"])
        conf = float(0.7 + 0.3 * rng.rand())
        others = [l for l in LAYOUT_LABELS if l != r["label"]]
        alt = [others[int(i)] for i in rng.choice(len(others), 4, replace=False)]
        rest = (1.0 - conf) / 4.0
        top_k = {r["label"]: conf, **{a: rest for a in alt}}
        x1, y1, x2, y2 = (float(v) for v in r["bbox"])
        out.append({
            "emit_idx": r["order"], "label": r["label"],
            "x1": x1, "y1": y1, "x2": x2, "y2": y2,
            "confidence": conf, "top_k": top_k,
        })
    return out


# ------------------------------------------------------------------ table rec
def surrogate_table(crop_bytes: bytes) -> list[dict]:
    """Table crop blob → row/col items in emit order (pass 1 of the
    reference's two-pass decode, /root/reference/surya/table_rec/__init__.py:181-231).
    The cell grid is assembled relationally downstream."""
    desc = decode_crop(crop_bytes) if crop_bytes.startswith(CROP_MAGIC) else None
    table = desc.get("table") if desc else None
    if not table:
        return []
    items = []
    x, y = table["x"], table["y"]
    cw, chh = table["cell_w"], table["cell_h"]
    n_rows, n_cols = table["rows"], table["cols"]
    for r in range(n_rows):
        items.append({
            "item_kind": "row", "item_id": r,
            "x1": float(x), "y1": float(y + r * chh),
            "x2": float(x + n_cols * cw), "y2": float(y + (r + 1) * chh),
            "is_header": r == 0, "colspan": None, "rowspan": None,
        })
    for c in range(n_cols):
        items.append({
            "item_kind": "col", "item_id": c,
            "x1": float(x + c * cw), "y1": float(y),
            "x2": float(x + (c + 1) * cw), "y2": float(y + n_rows * chh),
            "is_header": False, "colspan": None, "rowspan": None,
        })
    # pass-2 analog: spanning cells (reference decodes these per row,
    # /root/reference/surya/table_rec/__init__.py:193-231); vertical spans
    # are the merge_up/merge_down rowspan case (:346-377)
    for i, m in enumerate(table.get("merges", [])):
        r, c = m["row"], m["col"]
        cs, rs = m.get("colspan", 1), m.get("rowspan", 1)
        items.append({
            "item_kind": "spanning_cell", "item_id": i,
            "x1": float(x + c * cw), "y1": float(y + r * chh),
            "x2": float(x + (c + cs) * cw), "y2": float(y + (r + rs) * chh),
            "is_header": r == 0, "colspan": cs, "rowspan": rs,
        })
    return items


def encode_table_crop(desc: dict, bbox: list[float]) -> bytes:
    """Crop a page descriptor to its table region (coordinates kept in crop
    space) — the layout→table crop join payload."""
    cx1, cy1, _, _ = bbox
    t = desc.get("table")
    payload = {"crop": [0.0, 0.0, bbox[2] - bbox[0], bbox[3] - bbox[1]],
               "lines": [], "table": None}
    if t:
        payload["table"] = {**t, "x": t["x"] - cx1, "y": t["y"] - cy1}
    return CROP_MAGIC + zlib.compress(json.dumps(payload, sort_keys=True).encode())


# -------------------------------------------------------- provider pattern
class ModelProvider:
    """Executor-local lazy singleton for real model weights — the
    deployment-side extension surface mirroring BasePredictor's
    model_loader_cls (/root/reference/surya/common/predictor.py:9-57) and
    the S3 checkpoint source (/root/reference/surya/common/s3.py).

    Broadcast the PATH, never the weights: each executor process loads
    once on first UDF call and caches in the process (Spark reuses Python
    workers across tasks). Usage inside a slot:

        provider = ModelProvider("s3://bucket/detection.pt", load_detector)
        def real_detect(ref, w, h, blob):
            model = provider.get()          # loads once per executor
            ...

    In this sandbox no torch exists, so load_fn is injected; get() raises
    a clear error if the loader needs unavailable libraries.
    """

    _cache: dict = {}  # class-level: one instance per (path) per process

    def __init__(self, checkpoint_path: str, load_fn):
        self.checkpoint_path = checkpoint_path
        self._load_fn = load_fn

    def get(self):
        key = self.checkpoint_path
        if key not in ModelProvider._cache:
            ModelProvider._cache[key] = self._load_fn(self.checkpoint_path)
        return ModelProvider._cache[key]


def render_pdf_pages(pdf_bytes: bytes, dpi: int = 96,
                     indices: list[int] | None = None) -> list[dict]:
    """Deployment slot: render PDF pages to RGB pixel arrays — the
    reference's open_pdf + get_page_images
    (/root/reference/surya/input/processing.py:23-32): pypdfium2 render
    at scale dpi/72 with annotations suppressed, converted to RGB.

    Guarded body: runs for real on a box with pypdfium2 installed
    (test_real_slot_bodies skips-if-absent); raises NotImplementedError
    here so callers fail loudly instead of silently degrading."""
    try:  # pragma: no cover - library absent in this container
        import pypdfium2
    except ImportError as e:
        raise NotImplementedError(
            "PDF rendering requires pypdfium2 — not present in this "
            "container; wire a renderer into media decode slots at "
            "deployment"
        ) from e

    import numpy as np  # pragma: no cover - below runs only with the lib

    doc = pypdfium2.PdfDocument(pdf_bytes)
    try:
        page_idxs = list(indices) if indices is not None else range(len(doc))
        out = []
        for i in page_idxs:
            pil = doc[i].render(scale=dpi / 72,
                                draw_annots=False).to_pil().convert("RGB")
            arr = np.asarray(pil, dtype=np.uint8)
            out.append({
                "page_idx": int(i),
                "width": int(arr.shape[1]),
                "height": int(arr.shape[0]),
                "pixels": arr,
            })
        return out
    finally:
        doc.close()


# ------------------------------------------------------------------ ocr error
def surrogate_ocr_error(text: str) -> str:
    """'good'/'bad' text-quality label, deterministic heuristic standing in
    for the DistilBERT classifier (/root/reference/surya/ocr_error/__init__.py:14-63)."""
    if not text:
        return "bad"
    n = len(text)
    alnum = sum(ch.isalnum() or ch.isspace() for ch in text)
    return "good" if alnum / n >= 0.7 else "bad"
