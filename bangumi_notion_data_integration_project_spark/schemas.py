"""Explicit StructTypes for the Bangumi-shaped payloads (FIXTURES.md).

The reference infers schemas from data (pd.DataFrame(list_of_dicts),
bangumi_data_ingestion.py:576-577); here they are declared once and
used for from_json / createDataFrame so nested types stay native
end-to-end (SURVEY §1.3 design decision).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Ragged infobox values (string | {"v": s} | [{"v": s} | s] — reference
# parse_infobox bangumi_data_ingestion.py:263-295) can't be held by one
# static type; parse the `value` as a raw JSON string and normalize with
# infobox_normalize() (sources/bangumi.py).
TAG = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("count", T.LongType()),
    ]
)

SUBJECT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("name_cn", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("rank", T.LongType()),
        T.StructField("collection_total", T.LongType()),
        T.StructField("eps", T.LongType()),
        T.StructField("volumes", T.LongType()),
        T.StructField("date", T.StringType()),
        T.StructField("type", T.LongType()),
        T.StructField("short_summary", T.StringType()),
        T.StructField("tags", T.ArrayType(TAG)),
        # key/value pairs; value kept as raw string (normalized later)
        T.StructField(
            "infobox",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

COLLECTION_ITEM = T.StructType(
    [
        T.StructField("created_at", T.StringType()),
        T.StructField("updated_at", T.StringType()),
        T.StructField("ep_status", T.LongType()),
        T.StructField("vol_status", T.LongType()),
        T.StructField("subject", SUBJECT),
    ]
)

# One REST page (FIXTURES.md F1, reference fetch_single_category
# bangumi_data_ingestion.py:193-200)
API_PAGE = T.StructType(
    [
        T.StructField("total", T.LongType()),
        T.StructField("limit", T.LongType()),
        T.StructField("offset", T.LongType()),
        T.StructField("data", T.ArrayType(COLLECTION_ITEM)),
    ]
)

# F2 raw_collections (reference raw row :409-431; docx §4.2)
RAW_COLLECTIONS = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("subject_id", T.LongType()),
        T.StructField("subject_type", T.IntegerType()),
        T.StructField("collection_type", T.IntegerType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
        T.StructField("ep_status", T.LongType()),
        T.StructField("vol_status", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("name_cn", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("rank", T.LongType()),
        T.StructField("collection_total", T.LongType()),
        T.StructField("eps", T.LongType()),
        T.StructField("volumes", T.LongType()),
        T.StructField("date", T.StringType()),
        T.StructField("type", T.LongType()),
        T.StructField("short_summary", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("tags_raw", T.StringType()),
        T.StructField("infobox_raw", T.StringType()),
    ]
)

# Category label domains (bangumi_data_ingestion.py:26-41)
SUBJECT_TYPE_LABELS = {1: "书籍", 2: "动画", 3: "音乐", 4: "游戏", 6: "三次元"}
COLLECTION_TYPE_LABELS = {1: "想看", 2: "看过", 3: "在看", 4: "搁置", 5: "抛弃"}
