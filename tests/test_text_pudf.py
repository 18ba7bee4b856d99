"""Stateful text kernels vs reference semantics — pure-Python kernels
tested directly (fast), pandas_udf wrappers smoke-tested through Spark."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from surya_spark.functions.text_pudf import (
    clean_math_tags_py,
    clean_math_tags_udf,
    fix_unbalanced_tags_py,
    truncate_repetitions_py,
)


def test_clean_math_tags():
    assert clean_math_tags_py("<math>a<br>+b</math>") == "<math>a+b</math>"
    assert clean_math_tags_py("x</math>y") == "xy"  # orphan closer dropped
    assert clean_math_tags_py("<math>a</math>ok</math>") == "<math>a</math>ok"
    assert clean_math_tags_py("no math here") == "no math here"
    assert (
        clean_math_tags_py('<math display="block">x<i>y</i></math>')
        == '<math display="block">xy</math>'
    )


def test_truncate_repetitions():
    base = "the result is the result is the result is "
    assert truncate_repetitions_py(base).count("the result is") < 3
    assert truncate_repetitions_py("short") == "short"
    clean = "a perfectly normal sentence with no repeats at all"
    assert truncate_repetitions_py(clean) == clean


def test_fix_unbalanced_tags():
    assert fix_unbalanced_tags_py("<i>x") == "<i>x</i>"
    assert fix_unbalanced_tags_py("x</i>") == "x"
    assert fix_unbalanced_tags_py("<b><i>x</i>") == "<b><i>x</i></b>"
    assert fix_unbalanced_tags_py("a<br>b") == "a<br>b"
    assert fix_unbalanced_tags_py("<i>x</i>") == "<i>x</i>"


def test_udf_wrapper(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"t": ["<math>a<br>b</math>", None, "plain"]})
    )
    out = [r["c"] for r in df.select(
        clean_math_tags_udf()(F.col("t")).alias("c")).collect()]
    assert out == ["<math>ab</math>", None, "plain"]
