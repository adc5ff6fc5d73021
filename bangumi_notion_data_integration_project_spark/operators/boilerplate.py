"""Cross-document boilerplate removal — drop repeated lines/segments.

The standard web-crawl cleaning pass (C4/RefinedWeb-style): a line that
appears verbatim in many distinct documents is template boilerplate
(navigation, cookie banners, footers) and is removed from EVERY
document, preserving the order of what remains.

Shape, all native expressions:

  posexplode(split) → per-(doc, segment) rows
  → distinct (doc, segment) → groupBy segment: distinct-doc frequency
  → keep ONLY segments with df ≥ threshold (tiny: boilerplate is by
    definition the repeated tail) → broadcast left-outer flag join
  → ordered reassembly per doc: array_sort(collect_list(struct(idx, …)))

One explode, two segment-keyed hash aggregates (distinct + count share
one exchange), one BROADCAST join — the corpus itself is never
shuffled by segment text on the way back; only the reassembly groupBy
shuffles it, partitioned by doc_id.  ``array_sort`` on the unique
segment index makes ``collect_list`` order-insensitive, so the result
is deterministic under any partitioning.  If a pathological corpus has
a frequent-segment set too large to broadcast, lower the threshold's
selectivity or swap ``F.broadcast`` for a plain join — the semantics
are unchanged.

The splitter is pluggable: production corpora split on newlines
(``delimiter="\\n"``); the synthetic test corpus is single-line, so the
query layer segments by fixed word windows instead (same plan shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalized(text: Column) -> Column:
    return F.trim(F.regexp_replace(text, r"\s+", " "))


def segment_by_words(
    df: DataFrame, id_col: str, text_col: str, *, words_per_segment: int = 8
) -> DataFrame:
    """Split whitespace-normalized text into fixed-width word windows:
    (id, seg_idx, segment) rows, seg_idx 0-based and contiguous.  The
    single-line stand-in for ``segment_by_lines`` — identical downstream
    contract."""
    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(_normalized(F.col(text_col)), " ")).alias(
            "__pos", "__word"
        ),
    )
    seg_idx = (F.col("__pos") / words_per_segment).cast("long")
    return (
        words.groupBy(F.col(id_col), seg_idx.alias("seg_idx"))
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__word"))),
                    lambda s: s["__word"],
                ),
            ).alias("segment")
        )
    )


def segment_by_lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Newline segmentation for real multi-line corpora: (id, seg_idx,
    segment) with blank lines dropped and seg_idx preserving order."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("seg_idx", "segment"),
    )
    return lines.filter(F.length(F.trim("segment")) > 0).withColumn(
        "segment", F.trim("segment")
    )


def remove_frequent_segments(
    segments: DataFrame,
    id_col: str,
    *,
    max_doc_freq: int,
) -> DataFrame:
    """Given (id, seg_idx, segment) rows, drop every segment whose
    verbatim text appears in ≥ ``max_doc_freq`` distinct documents, and
    reassemble per document in seg_idx order.

    Returns one row per input document:
      id, n_segments, n_kept, kept_md5 (md5 of the space-joined kept
      segments; md5('') for fully-boilerplate documents — the row is
      kept so downstream joins see the doc was processed, not lost).
    """
    frequent = (
        segments.select(id_col, "segment")
        .distinct()
        .groupBy("segment")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") >= max_doc_freq)
        .select("segment", F.lit(True).alias("__boiler"))
    )
    flagged = segments.join(F.broadcast(frequent), "segment", "left").withColumn(
        "__kept", F.col("__boiler").isNull()
    )
    kept_in_order = F.transform(
        F.filter(
            F.array_sort(F.collect_list(F.struct("seg_idx", "__kept", "segment"))),
            lambda s: s["__kept"],
        ),
        lambda s: s["segment"],
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_segments"),
        F.sum(F.col("__kept").cast("long")).cast("long").alias("n_kept"),
        F.md5(F.concat_ws(" ", kept_in_order)).alias("kept_md5"),
    )
