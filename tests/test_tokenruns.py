"""Token-run segmentation parity vs the reference tokenize/decode loops
(/root/reference/surya/common/surya/processor/tokenizer.py:69-156,
/root/reference/surya/recognition/__init__.py:609-771) on fixture strings
with astral characters and math spans."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from surya_spark.functions import tokenruns as TR

FIXTURES = [
    "plain ascii text",
    "emoji \U0001f600 inside",                      # astral → 2 utf16 units
    "x <math>a+b^2</math> y",                       # math span → qwen run
    "<i>ital</i> and <math>\\frac{a}{b}</math>",    # format + math
    "<math display='block'>E=mc^2</math>",          # block math open tag
    "mixed \U0001f680 <b>bold</b> <math>z</math> tail",
]


def test_tokenize_roundtrip_and_run_kinds():
    for s in FIXTURES:
        ids = TR.tokenize_py(s)
        runs = TR.decode_runs_py(ids)
        # surface reconstruction is exact (no NOMATH/SCRIPT in fixtures)
        assert "".join(r["text"] for r in runs) == s, s
        # math bodies decode as qwen runs, tags as special runs
        if "<math" in s:
            kinds = [r["kind"] for r in runs]
            assert "qwen" in kinds and "special" in kinds, s
        for r in runs:
            if r["kind"] == "special":
                assert r["text"].startswith("<")


def test_astral_chars_two_units_one_char():
    ids = TR.tokenize_py("\U0001f600")
    assert len(ids) == 2  # surrogate pair = two utf-16 code units
    runs = TR.decode_runs_py(ids)
    assert [r["text"] for r in runs] == ["\U0001f600"]


def test_eos_stop_and_dropped_specials():
    ids = (TR.text_to_utf16_ids("ab")
           + [TR.SPECIAL_TOKEN_MAPPING["<NOMATH>"]]
           + TR.text_to_utf16_ids("cd")
           + [TR.EOS_ID]
           + TR.text_to_utf16_ids("ZZ"))   # after EOS → ignored
    runs = TR.decode_runs_py(ids)
    assert [(r["kind"], r["text"]) for r in runs] == [
        ("ocr", "ab"), ("ocr", "cd")]


def test_decode_runs_spark_udf(spark):
    pdf = pd.DataFrame({
        "line_id": list(range(len(FIXTURES))),
        "ids": [TR.tokenize_py(s) for s in FIXTURES],
    })
    df = spark.createDataFrame(pdf)
    out = df.select(
        "line_id",
        TR.decode_token_runs_udf()(F.col("ids")).alias("runs"),
    ).withColumn("text", TR.runs_text(F.col("runs")))
    got = {r["line_id"]: r["text"] for r in out.collect()}
    for i, s in enumerate(FIXTURES):
        assert got[i] == s

    # math tags from special runs flow through the tag-repair P-UDFs
    from surya_spark.functions.text_pudf import clean_math_tags_udf

    cleaned = out.withColumn("c", clean_math_tags_udf()(F.col("text")))
    for r in cleaned.collect():
        assert "</math>" not in r["c"] or "<math" in r["c"]
