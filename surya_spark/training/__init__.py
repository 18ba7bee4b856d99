"""Training-data pipeline operators: deduplication, similarity search,
text analysis, multimodal column plumbing — the corpus-scale toolkit a
100 TB extraction pipeline feeds."""

from . import dedup, multimodal, similarity, textstats  # noqa: F401
