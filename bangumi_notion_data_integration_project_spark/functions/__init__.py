"""Column-level building blocks (all JVM-side `pyspark.sql.functions`
compositions — no Python UDFs in any hot path)."""

from .scalar import coalesce_nonempty, map_multikey_coalesce, parse_timestamp_naive, truncate_str
from .semistructured import positional_pivot, tags_to_names, top_k_sorted_slice
from .text import (
    lang_marker_scores,
    positional_fingerprint,
    punct_ratio,
    stopword_ratio,
    token_count,
    tokens,
)
from .vectors import cosine_similarity, dot_product, l2_norm

__all__ = [
    "coalesce_nonempty",
    "map_multikey_coalesce",
    "parse_timestamp_naive",
    "truncate_str",
    "positional_pivot",
    "tags_to_names",
    "top_k_sorted_slice",
    "tokens",
    "token_count",
    "punct_ratio",
    "stopword_ratio",
    "lang_marker_scores",
    "positional_fingerprint",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
