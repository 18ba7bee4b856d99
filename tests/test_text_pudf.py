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


def test_detect_repeat_token_reference_parity(spark):
    """Column expression vs an independent port of the reference rule
    (surya/recognition/util.py:59-69) on loop/non-loop tail fixtures."""
    from pyspark.sql import functions as F

    from surya_spark.functions import text as TX

    def ref_rule(toks, max_repeats=40):
        if len(toks) < max_repeats:
            return False
        last_n = toks[-max_repeats:]
        u = len(set(last_n))
        if u > 5:
            return False
        return last_n[-u:] == last_n[-2 * u: -u]

    fixtures = [
        list(range(50)),                        # diverse -> False
        [1] * 50,                               # single-token loop -> True
        list(range(10)) + [7, 8, 9] * 11,       # 3-cycle tail -> True
        list(range(35)) + [1, 2, 3, 4, 5] * 2,  # 40 tokens, tail 5-cycle
        list(range(36)) + [1, 2, 3, 4],         # <=5 distinct, NOT periodic
        [1, 2] * 10,                            # shorter than window -> False
        list(range(34)) + [9, 8] * 3,           # 2-cycle tail -> True
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(fixtures)],
                               "i int, toks array<int>")
    got = {r["i"]: r["rep"] for r in df.select(
        "i", TX.detect_repeat_token(F.col("toks")).alias("rep")).collect()}
    for i, toks in enumerate(fixtures):
        assert got[i] == ref_rule(toks), (i, toks[-10:])


def test_round_to_divisor_int_trunc(spark):
    from pyspark.sql import functions as F

    from surya_spark.functions import geometry as G

    df = spark.createDataFrame(
        [(0.0,), (19.9,), (20.0,), (37.5,), (59.99,)], "v double")
    got = [r["o"] for r in df.select(
        G.round_to_divisor(F.col("v"), 20.0).alias("o")).collect()]
    # int(v / d) * d — truncation, not floor-to-nearest-half semantics
    assert got == [0.0, 0.0, 20.0, 20.0, 40.0]
