"""Unit tests for the relational Bloom prefilter and the cross-document
boilerplate (frequent-segment) scrub."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from bangumi_notion_data_integration_project_spark.operators.bloom import (
    bloom_build,
    bloom_prefilter,
)
from bangumi_notion_data_integration_project_spark.operators.boilerplate import (
    remove_frequent_segments,
    segment_by_lines,
    segment_by_words,
)


# ---------------------------------------------------------------- bloom


def _kv(spark, values, name="v"):
    return spark.createDataFrame([(v,) for v in values], f"{name}: string")


def test_bloom_no_false_negatives(spark):
    """Every probe value actually present in the build set MUST survive
    (the defining Bloom guarantee), even at an absurdly small bit space
    where collisions are rampant."""
    build_vals = [f"gram-{i}" for i in range(50)]
    build = _kv(spark, build_vals)
    probe = _kv(spark, build_vals + [f"other-{i}" for i in range(50)])
    for num_bits in (64, 1 << 20):
        bits = bloom_build(build, "v", num_bits=num_bits)
        kept = {
            r["v"]
            for r in bloom_prefilter(probe, "v", bits, num_bits=num_bits).collect()
        }
        assert set(build_vals) <= kept, f"false negative at num_bits={num_bits}"


def test_bloom_prunes_non_members(spark):
    """At a healthy bit space the prefilter drops (nearly) all absent
    values: 1000 disjoint probes against a 100-value build set must
    shrink by >90% (expected fp rate ~(k*n/m)^k ~ 1e-13)."""
    build = _kv(spark, [f"in-{i}" for i in range(100)])
    probe = _kv(spark, [f"out-{i}" for i in range(1000)])
    bits = bloom_build(build, "v")
    survivors = bloom_prefilter(probe, "v", bits).count()
    assert survivors < 100


def test_bloom_prefilter_plus_exact_verify_is_exact(spark):
    """Differential: bloom-prefilter → exact semi-join equals the plain
    exact semi-join, at a tiny bit space that forces false positives
    through the Bloom stage (so the verify step is actually exercised)."""
    build = _kv(spark, [f"g{i}" for i in range(0, 40, 2)])  # evens
    probe = _kv(spark, [f"g{i}" for i in range(40)])  # all
    exact = {r["v"] for r in probe.join(build, "v", "left_semi").collect()}

    bits = bloom_build(build, "v", num_bits=32, num_hashes=2)
    pre = bloom_prefilter(probe, "v", bits, num_bits=32, num_hashes=2)
    assert pre.count() > len(exact), "tiny bit space should admit false positives"
    verified = {r["v"] for r in pre.join(build, "v", "left_semi").collect()}
    assert verified == exact


def test_bloom_probe_side_joins_are_broadcast(spark):
    """The whole point at scale: the probe side must meet the bit table
    via broadcast hash semi-joins, never a shuffle on the probe rows."""
    build = _kv(spark, [f"b{i}" for i in range(20)])
    probe = _kv(spark, [f"b{i}" for i in range(200)])
    bits = bloom_build(build, "v")
    plan = (
        bloom_prefilter(probe, "v", bits)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------- boilerplate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_segment_by_words_windows_and_order(spark):
    d = _docs(spark, [(1, "a b c d e f g h i j")])
    segs = {
        (r["seg_idx"], r["segment"])
        for r in segment_by_words(d, "doc_id", "text", words_per_segment=4).collect()
    }
    assert segs == {(0, "a b c d"), (1, "e f g h"), (2, "i j")}


def test_segment_by_lines_drops_blanks_keeps_order(spark):
    d = _docs(spark, [(1, "first line\n\n  second line  \nthird")])
    rows = sorted(
        (r["seg_idx"], r["segment"])
        for r in segment_by_lines(d, "doc_id", "text").collect()
    )
    assert rows == [(0, "first line"), (2, "second line"), (3, "third")]


def test_remove_frequent_segments_drops_boilerplate_preserves_order(spark):
    """'cookie banner' appears in 3 docs (>= max_doc_freq 3) and is
    scrubbed from all of them; unique content survives in order."""
    d = _docs(
        spark,
        [
            (1, "cookie banner alpha text"),
            (2, "cookie banner beta text"),
            (3, "gamma text cookie banner"),
            (4, "delta only content here"),
        ],
    )
    segs = segment_by_words(d, "doc_id", "text", words_per_segment=2)
    out = {
        r["doc_id"]: (r["n_segments"], r["n_kept"], r["kept_md5"])
        for r in remove_frequent_segments(segs, "doc_id", max_doc_freq=3).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert out[1] == (2, 1, md5("alpha text"))
    assert out[2] == (2, 1, md5("beta text"))
    assert out[3] == (2, 1, md5("gamma text"))
    assert out[4] == (2, 2, md5("delta only content here"))


def test_remove_frequent_segments_keeps_fully_scrubbed_doc_row(spark):
    """A document that is ENTIRELY boilerplate still yields a row
    (md5('') fingerprint) — it was processed, not lost."""
    d = _docs(spark, [(i, "same exact text") for i in range(1, 5)])
    segs = segment_by_words(d, "doc_id", "text", words_per_segment=3)
    out = remove_frequent_segments(segs, "doc_id", max_doc_freq=2)
    rows = {r["doc_id"]: (r["n_kept"], r["kept_md5"]) for r in out.collect()}
    empty_md5 = hashlib.md5(b"").hexdigest()
    assert len(rows) == 4
    assert all(v == (0, empty_md5) for v in rows.values())


def test_remove_frequent_segments_reassembly_is_partition_insensitive(spark):
    """array_sort on the unique seg_idx makes collect_list order
    irrelevant: a heavily repartitioned input yields identical
    fingerprints."""
    d = _docs(spark, [(1, " ".join(f"w{i}" for i in range(40)))])
    segs = segment_by_words(d, "doc_id", "text", words_per_segment=4)
    base = remove_frequent_segments(segs, "doc_id", max_doc_freq=99).collect()[0]
    shuffled = remove_frequent_segments(
        segs.repartition(16), "doc_id", max_doc_freq=99
    ).collect()[0]
    assert base["kept_md5"] == shuffled["kept_md5"]
    assert base["n_segments"] == 10
