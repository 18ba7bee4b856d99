"""Token-run segmentation: the recognizer's decoded token stream split into
qwen / special / ocr runs, each detokenized by its own rule.

Reference semantics re-implemented here:
  * token id space (/root/reference/surya/common/surya/processor/
    tokenizer.py:26-66): [0, qwen_offset) = qwen tokens (math content),
    [qwen_offset, special_offset) = special tags, >= special_offset =
    UTF-16 code units shifted by special_offset.
  * tokenize loop (tokenizer.py:69-126): system/math/format tags match at
    the string head as special ids; an open <math> routes content to the
    qwen tokenizer until </math>; everything else becomes UTF-16LE code
    units (astral chars occupy TWO units).
  * run segmentation (/root/reference/surya/recognition/__init__.py:
    609-771): stop at EOS/PAD; a run breaks whenever the qwen-ness flips
    or a special token is entered/left (each special is its own run);
    ocr runs decode as UTF-16 (per-char boxes downstream), special runs
    decode via the reverse tag map with <NOMATH>/<SCRIPT-*> dropped,
    qwen runs decode via the injectable qwen codec.

The sandbox has no real qwen vocab, so the default codec is the identity
codepoint codec (id = ord(char)); a deployment passes the real
tokenizer's encode/decode. Math tags emitted by special runs flow through
the existing tag-repair P-UDFs (functions/text_pudf.py) unchanged.
"""

from __future__ import annotations

import re
from typing import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

QWEN_OFFSET = 100_000  # surrogate qwen vocab size (BMP codepoints fit)

SPECIAL_TOKENS = [
    "<EOS>", "<PAD>",                              # system
    "<math>", "<math display='block'>", "</math>",  # math_external
    "<br>", "<b>", "</b>", "<i>", "</i>",           # formatting
    "<u>", "</u>", "<sub>", "</sub>", "<sup>", "</sup>",
    "<NOMATH>", "<SCRIPT-sub>", "<SCRIPT-sup>",
]
SPECIAL_TOKEN_MAPPING = {t: QWEN_OFFSET + i for i, t in enumerate(SPECIAL_TOKENS)}
REVERSE_SPECIAL = {v: k for k, v in SPECIAL_TOKEN_MAPPING.items()}
SPECIAL_OFFSET = QWEN_OFFSET + len(SPECIAL_TOKENS)
EOS_ID = SPECIAL_TOKEN_MAPPING["<EOS>"]
PAD_ID = SPECIAL_TOKEN_MAPPING["<PAD>"]

_MATH_START = "<math"
_MATH_END = "</math>"
_SCRIPT_RE = re.compile(r"<SCRIPT-\w+>")


def _tag_pattern(tokens: list[str]) -> re.Pattern:
    # longest-first head anchor, exactly like create_token_regex
    # (tokenizer.py:18-23)
    esc = sorted((re.escape(t) for t in tokens), key=len, reverse=True)
    return re.compile(r"^(" + "|".join(esc) + r")")


_TAG_RE = _tag_pattern([t for t in SPECIAL_TOKENS if t not in ("<EOS>", "<PAD>")])


def qwen_encode_codepoints(s: str) -> list[int]:
    """Surrogate qwen codec: one token per codepoint."""
    return [ord(c) for c in s]


def qwen_decode_codepoints(ids: list[int]) -> str:
    return "".join(chr(i) for i in ids)


def text_to_utf16_ids(s: str) -> list[int]:
    """UTF-16LE code units + special offset (tokenizer.py:128-141)."""
    b = s.encode("utf-16-le")
    return [b[i] + (b[i + 1] << 8) + SPECIAL_OFFSET for i in range(0, len(b), 2)]


def utf16_ids_to_text(ids: list[int]) -> str:
    ba = bytearray()
    for i in ids:
        v = i - SPECIAL_OFFSET
        ba.append(v & 0xFF)
        ba.append((v >> 8) & 0xFF)
    return ba.decode("utf-16-le", errors="ignore")


def tokenize_py(text: str,
                qwen_encode: Callable[[str], list[int]] = qwen_encode_codepoints
                ) -> list[int]:
    """Mirror of InnerOCRTokenizer._tokenize (tokenizer.py:69-126)."""
    tokens: list[int] = []
    in_math = False
    while text:
        m = _TAG_RE.search(text)
        if m:
            tag = m.group(1)
            if tag.startswith(_MATH_START):
                in_math = True
            elif tag == _MATH_END:
                in_math = False
            tokens.append(SPECIAL_TOKEN_MAPPING[tag])
            text = text[m.end():]
            continue
        if in_math:
            end = text.find(_MATH_END)
            if end == -1:
                end = len(text)
            tokens += qwen_encode(text[:end])
            text = text[end:]
            continue
        tokens += text_to_utf16_ids(text[0])
        text = text[1:]
    return tokens


def decode_runs_py(ids: list[int],
                   qwen_decode: Callable[[list[int]], str] = qwen_decode_codepoints
                   ) -> list[dict]:
    """The run-segmentation loop of get_bboxes_text
    (recognition/__init__.py:656-771): returns [{kind, text}] in order.
    <NOMATH>/<SCRIPT-*> specials are dropped; EOS/PAD stops decoding."""
    runs: list[tuple[str, list[int]]] = []
    seq: list[int] = []
    past_qwen = False
    past_special = False

    def flush(qwen: bool, special: bool, force: bool = False) -> None:
        nonlocal seq
        if (qwen != past_qwen or force or special or past_special) and seq:
            kind = ("qwen" if past_qwen else
                    "special" if past_special else "ocr")
            runs.append((kind, seq))
            seq = []

    for tid in ids:
        if tid in (EOS_ID, PAD_ID):
            break
        qwen = tid < QWEN_OFFSET
        special = QWEN_OFFSET <= tid < SPECIAL_OFFSET
        flush(qwen, special)
        seq.append(tid)
        past_qwen = qwen
        past_special = special
    flush(False, False, force=True)

    out = []
    for kind, tids in runs:
        if kind == "ocr":
            out.append({"kind": kind, "text": utf16_ids_to_text(tids)})
        elif kind == "special":
            text = REVERSE_SPECIAL.get(tids[0], "")
            if text == "<NOMATH>" or _SCRIPT_RE.match(text):
                continue
            out.append({"kind": kind, "text": text})
        else:
            out.append({"kind": kind, "text": qwen_decode(tids)})
    return out


_RUNS_T = T.ArrayType(T.StructType([
    T.StructField("kind", T.StringType(), False),
    T.StructField("text", T.StringType(), False),
]))


def decode_token_runs_udf(
    qwen_decode: Callable[[list[int]], str] = qwen_decode_codepoints,
):
    """array<int> token ids → array<struct<kind,text>> runs, Arrow-batched."""

    @F.pandas_udf(_RUNS_T)
    def udf(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None if v is None else decode_runs_py(list(v), qwen_decode)
        )

    return udf


def runs_text(runs: Column) -> Column:
    """Concatenated surface text of a run array (math/format tags included,
    ready for the tag-repair P-UDFs). Cold path — the transform HOF is fine
    outside per-token hot loops."""
    return F.array_join(F.transform(runs, lambda r: r["text"]), "")
