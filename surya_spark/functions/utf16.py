"""UTF-16 code-unit text model (SURVEY.md §7.3 hard part).

The reference's recognizer tokenizes text as UTF-16LE code units
(/root/reference/surya/common/surya/processor/tokenizer.py:69-156):
astral-plane characters (emoji, rare CJK) occupy TWO units, so unit
counts ≠ Python len(). Char-stream parity requires operating on code
units.

utf16_units is a pure column expression (codepoints + astral count);
encode/decode of unit arrays are Arrow-vectorized pandas UDFs over
numpy's uint16 view — no per-row Python string loops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ASTRAL = r"[^\x{10000}-\x{10FFFF}]"


def utf16_units(text: Column) -> Column:
    """Number of UTF-16 code units = codepoints + astral codepoints.
    Pure expression (also ANSI-oracle-able: both Spark length() and
    DuckDB length() count codepoints)."""
    astral = F.length(F.regexp_replace(text, _ASTRAL, ""))
    return (F.length(text) + astral).cast("long")


@F.pandas_udf(T.ArrayType(T.IntegerType()))
def to_code_units(s: pd.Series) -> pd.Series:
    """text → array of UTF-16LE code-unit values (the reference's token id
    space before special-token offsets)."""

    def conv(v):
        if v is None:
            return None
        return np.frombuffer(v.encode("utf-16-le"), dtype="<u2").astype(
            "int32").tolist()

    return s.map(conv)


@F.pandas_udf(T.StringType())
def from_code_units(s: pd.Series) -> pd.Series:
    """Inverse of to_code_units (surrogate pairs re-combine)."""

    def conv(v):
        if v is None:
            return None
        return np.asarray(v, dtype="<u2").tobytes().decode(
            "utf-16-le", errors="replace")

    return s.map(conv)
