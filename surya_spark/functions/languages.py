"""Language metadata surface: ISO 639-1 code <-> display-name mapping
and the Spark expressions/dim to attach names at any grain.

Mirrors the reference's user-visible language API
(/root/reference/surya/recognition/languages.py:1-98 — CODE_TO_LANGUAGE
and the derived LANGUAGE_TO_CODE used by its app/API layers to surface
readable names for recognition language hints). The mapping itself is
standard ISO 639-1 factual data plus the reference's '_math' marker for
its math-recognition mode; the engine exposes the same code set so a
reference user's language hints resolve identically.

Scale note: this is a ~100-entry constant dimension. Per-row lookups
compile to a single map-literal expression (JVM, codegen); for join-
shaped uses language_dim() is a classic broadcast dimension — the one
place broadcast is correct (CLAUDE.md rule 7: broadcast dimensions,
never corpus-derived sides).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CODE_TO_LANGUAGE: dict[str, str] = {
    "_math": "Math",
    "af": "Afrikaans", "am": "Amharic", "ar": "Arabic", "as": "Assamese",
    "az": "Azerbaijani", "be": "Belarusian", "bg": "Bulgarian",
    "bn": "Bengali", "br": "Breton", "bs": "Bosnian", "ca": "Catalan",
    "cs": "Czech", "cy": "Welsh", "da": "Danish", "de": "German",
    "el": "Greek", "en": "English", "eo": "Esperanto", "es": "Spanish",
    "et": "Estonian", "eu": "Basque", "fa": "Persian", "fi": "Finnish",
    "fr": "French", "fy": "Western Frisian", "ga": "Irish",
    "gd": "Scottish Gaelic", "gl": "Galician", "gu": "Gujarati",
    "ha": "Hausa", "he": "Hebrew", "hi": "Hindi", "hr": "Croatian",
    "hu": "Hungarian", "hy": "Armenian", "id": "Indonesian",
    "is": "Icelandic", "it": "Italian", "ja": "Japanese", "jv": "Javanese",
    "ka": "Georgian", "kk": "Kazakh", "km": "Khmer", "kn": "Kannada",
    "ko": "Korean", "ku": "Kurdish", "ky": "Kyrgyz", "la": "Latin",
    "lo": "Lao", "lt": "Lithuanian", "lv": "Latvian", "mg": "Malagasy",
    "mk": "Macedonian", "ml": "Malayalam", "mn": "Mongolian",
    "mr": "Marathi", "ms": "Malay", "my": "Burmese", "ne": "Nepali",
    "nl": "Dutch", "no": "Norwegian", "om": "Oromo", "or": "Oriya",
    "pa": "Punjabi", "pl": "Polish", "ps": "Pashto", "pt": "Portuguese",
    "ro": "Romanian", "ru": "Russian", "sa": "Sanskrit", "sd": "Sindhi",
    "si": "Sinhala", "sk": "Slovak", "sl": "Slovenian", "so": "Somali",
    "sq": "Albanian", "sr": "Serbian", "su": "Sundanese", "sv": "Swedish",
    "sw": "Swahili", "ta": "Tamil", "te": "Telugu", "th": "Thai",
    "tl": "Tagalog", "tr": "Turkish", "ug": "Uyghur", "uk": "Ukrainian",
    "ur": "Urdu", "uz": "Uzbek", "vi": "Vietnamese", "xh": "Xhosa",
    "yi": "Yiddish", "zh": "Chinese",
}

LANGUAGE_TO_CODE: dict[str, str] = {
    v: k for k, v in CODE_TO_LANGUAGE.items()}


def language_name(code: str) -> str:
    """Python-side lookup; unknown codes echo back (the heuristic
    lang_id's 'und' stays 'und' rather than raising)."""
    return CODE_TO_LANGUAGE.get(code, code)


def _map_literal() -> str:
    pairs = ", ".join(
        f"'{c}', '{n.replace(chr(39), chr(39) * 2)}'"
        for c, n in CODE_TO_LANGUAGE.items())
    return f"map({pairs})"


def language_name_col(code_col: str | Column) -> Column:
    """Display name for a single code column — ONE map-literal
    expression (late-round-1 rule: build wide constants as one SQL
    string, not hundreds of py4j Column objects). Unknown codes pass
    through unchanged."""
    col = F.col(code_col) if isinstance(code_col, str) else code_col
    looked = F.element_at(F.expr(_map_literal()), col)
    return F.coalesce(looked, col)


def language_names_col(codes_col: str | Column) -> Column:
    """Display names for an array-of-codes column (the shape OCR language
    hints travel in, mirroring the reference's per-result languages
    list). Uses a transform lambda — acceptable here because language
    arrays are tiny metadata (<10 elements), NOT a hot-path array kernel
    (CLAUDE.md rule 1 governs data-sized arrays)."""
    col = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    m = _map_literal()
    return F.transform(col, lambda c: F.coalesce(
        F.element_at(F.expr(m), c), c))


def language_dim(spark: SparkSession) -> DataFrame:
    """(lang_code, lang_name) constant dimension for join-shaped
    enrichment — broadcast-sized by construction."""
    return spark.createDataFrame(
        sorted(CODE_TO_LANGUAGE.items()),
        "lang_code string, lang_name string")
