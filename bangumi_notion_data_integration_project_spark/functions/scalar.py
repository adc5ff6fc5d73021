"""Scalar column transforms (SURVEY §2.2 P1-P10).

Parity notes cite the reference; implementations are native Catalyst
expressions so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def coalesce_nonempty(*cols: Column | str) -> Column:
    """First non-null, non-empty-string value.

    Matches Python's ``a or b`` fallback used by the reference for the
    display name (bangumi_data_ingestion.py:438) and infobox attributes
    (:446-450): `""` is falsy there, while SQL COALESCE would keep it —
    hence the NULLIF wrapper.
    """
    normalized = [F.nullif(F.col(c) if isinstance(c, str) else c, F.lit("")) for c in cols]
    return F.coalesce(*normalized)


def map_multikey_coalesce(m: Column | str, *keys: str) -> Column:
    """First present (non-null, non-empty) value among map keys.

    Reference: multi-language infobox key fallback, e.g. 导演 or 監督
    (bangumi_data_ingestion.py:446-450). `element_at` is null-safe for
    absent keys.
    """
    mc = F.col(m) if isinstance(m, str) else m
    return coalesce_nonempty(*[F.element_at(mc, F.lit(k)) for k in keys])


def truncate_str(c: Column | str, n: int) -> Column:
    """Bounded string (reference truncates summaries to 500 chars at
    bangumi_data_ingestion.py:322 and 2000 at notion_data_ingestion.py:258,268)."""
    return F.substring(F.col(c) if isinstance(c, str) else c, 1, n)


def parse_timestamp_naive(c: Column | str, fmt: str | None = None) -> Column:
    """Timestamp parse with null-on-failure, timezone-naive semantics.

    Reference: ``pd.to_datetime(errors="coerce").tz_localize(None)``
    (bangumi_data_ingestion.py:397-403). ``try_to_timestamp`` gives the
    coerce behavior; the session timezone is pinned to UTC (session.py)
    so wall-clock values are stable.
    """
    col = F.col(c) if isinstance(c, str) else c
    if fmt is None:
        return F.try_to_timestamp(col)
    return F.try_to_timestamp(col, F.lit(fmt))
