"""CDC log replay — collapse a change stream into its net snapshot.

The reference's incremental load (data_loading_to_mysql_database.py:185-277)
diffs two *snapshots*; real upstream systems more often hand you the
*log* between them — one row per change event (insert/update/delete)
with a monotonically increasing sequence number. ``apply_cdc`` replays
such a log into the final table state in ONE shuffle, the companion to
``merge_snapshot`` (snapshot in) and ``snapshot_diff`` (verify after).

Scale design (100 TB of log):
- Single ``groupBy(key)`` with ``max_by`` — the per-key winner is found
  by map-side partial aggregation (each task keeps one candidate row
  per key), so the shuffle ships at most one row per (key, task), not
  the whole log. No window sort, no secondary shuffle, O(1) state per
  key.
- Compare the window formulation (``row_number() OVER (PARTITION BY key
  ORDER BY seq DESC)``): that must shuffle EVERY log row to its key's
  partition and sort there. ``max_by`` partial-aggregates first — on a
  log with high update churn (the common case) this is the difference
  between shuffling the log and shuffling the key set.
- Deletes win seq ties (op rank tiebreak) so replay is deterministic
  even if an upstream emits a delete and a late update with the same
  LSN.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_net(
    log: DataFrame,
    *,
    key: str,
    seq: str,
    op: str,
    payload_cols: Sequence[str],
    op_delete: str = "D",
) -> DataFrame:
    """Per-key net state of a CDC log INCLUDING delete tombstones.

    One aggregate: key → winning payload + ``last_op`` + ``n_versions``
    + ``last_seq``. Tombstone rows (``last_op == op_delete``) are kept
    so that incremental consumers can guard against out-of-order
    re-inserts of deleted keys; :func:`apply_cdc` filters them for the
    batch-visible view.
    """
    payload_cols = list(payload_cols)
    # rank deletes above payload ops at equal seq; the payload itself is
    # the FINAL tiebreak so that duplicated (key, seq) events with
    # different payloads (a malformed but real upstream) still resolve
    # to ONE deterministic winner on any partitioning — max_by with a
    # non-total order key returns an arbitrary tied row
    op_rank = F.when(F.col(op) == op_delete, F.lit(1)).otherwise(F.lit(0))
    winner = F.struct(
        *[F.col(c) for c in payload_cols], F.col(op).alias("__op")
    )
    order_key = F.struct(F.col(seq).alias("s"), op_rank.alias("r"), winner.alias("w"))
    agg = log.groupBy(key).agg(
        F.max_by(winner, order_key).alias("__w"),
        F.count("*").cast("long").alias("n_versions"),
        F.max(seq).alias("last_seq"),
    )
    return agg.select(
        key,
        *[F.col(f"__w.{c}").alias(c) for c in payload_cols],
        F.col("__w.__op").alias("last_op"),
        "n_versions",
        "last_seq",
    )


def apply_cdc(
    log: DataFrame,
    *,
    key: str,
    seq: str,
    op: str,
    payload_cols: Sequence[str],
    op_delete: str = "D",
) -> DataFrame:
    """Replay a CDC log into the net final snapshot.

    ``log`` has one row per change event: a key column, a monotonically
    increasing sequence column (LSN — higher wins), an op column whose
    value ``op_delete`` marks deletions (any other value carries a
    payload: insert and update are not distinguished, both mean "the
    row now looks like this"), and the payload columns.

    Returns one row per surviving key: the payload of its highest-seq
    event, plus ``n_versions`` (how many log events touched the key)
    and ``last_seq``. Keys whose winning event is a delete are absent.
    Seq ties are broken in favor of the delete (then by payload struct
    comparison) so the result is deterministic.
    """
    net = cdc_net(
        log, key=key, seq=seq, op=op, payload_cols=payload_cols, op_delete=op_delete
    )
    return net.filter(F.col("last_op") != op_delete).drop("last_op")


def maintain_grouped_agg(
    old_agg: DataFrame,
    old_snapshot: DataFrame,
    delta_net: DataFrame,
    *,
    key: str,
    group_col: str,
    val_col: str,
    op_delete: str = "D",
) -> DataFrame:
    """Incremental materialized-view maintenance: fold a CDC delta into
    a grouped (count, sum) aggregate in O(delta), never rescanning the
    base table.

    ``old_agg`` is the materialized (group, n_rows, total) view of
    ``old_snapshot``; ``delta_net`` is a :func:`cdc_net` result
    (tombstones included) whose payload carries ``group_col`` and
    ``val_col``. The maintenance algebra handles GROUP MIGRATION (an
    update that moves a row between groups) by construction: every
    touched key RETRACTS its old contribution from its old group and,
    if it survives, ASSERTS its new contribution to its new group —
    inserts have no retraction (semi join finds no old row), deletes no
    assertion.

    Why this is the 100 TB shape: the only read of the base table is a
    semi join on the touched keys (partition-prunable in a real
    layout), and everything else is group-sized. A delta of 1k rows
    against a 10¹² -row base does 1k rows of work plus one read of the
    view. The differential test asserts the fold equals a full
    recompute of the post-merge snapshot.
    """
    touched = delta_net.select(key)
    before = old_snapshot.join(touched, key, "left_semi")
    retract = before.groupBy(group_col).agg(
        (-F.count("*")).cast("long").alias("dn"),
        (-F.sum(val_col)).alias("dv"),
    )
    assertions = (
        delta_net.filter(F.col("last_op") != op_delete)
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("dn"),
            F.sum(val_col).alias("dv"),
        )
    )
    deltas = (
        retract.unionByName(assertions)
        .groupBy(group_col)
        .agg(F.sum("dn").cast("long").alias("dn"), F.sum("dv").alias("dv"))
    )
    # eqNullSafe: groupBy treats NULL as a real group, but a plain join
    # key never matches NULL==NULL — a NULL group would split into an
    # unretracted stale row plus a delta-only row. Aliases because both
    # sides usually derive from the same base lineage (self-join).
    oa, dl = old_agg.alias("__oa"), deltas.alias("__dl")
    merged = oa.join(
        dl,
        F.col(f"__oa.{group_col}").eqNullSafe(F.col(f"__dl.{group_col}")),
        "full_outer",
    ).select(
        F.coalesce(F.col(f"__oa.{group_col}"), F.col(f"__dl.{group_col}")).alias(group_col),
        (F.coalesce(F.col("n_rows"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0)))
        .cast("long")
        .alias("n_rows"),
        (
            F.coalesce(F.col("total"), F.lit(0).cast("long"))
            + F.coalesce(F.col("dv"), F.lit(0).cast("long"))
        ).alias("total"),
    )
    return merged.filter(F.col("n_rows") > 0)


def merge_cdc_state(
    state: DataFrame,
    delta: DataFrame,
    *,
    key: str,
    payload_cols: Sequence[str],
    op_delete: str = "D",
) -> DataFrame:
    """Fold a new :func:`cdc_net` delta into accumulated net state.

    Both inputs carry the ``cdc_net`` schema (payload + last_op +
    n_versions + last_seq, tombstones included). The fold is the SAME
    single max_by aggregate as ``cdc_net`` itself — net state is
    associative, which is what makes the streaming replay
    (``start_streaming_cdc_apply``) equal the batch replay of the
    concatenated log regardless of how events are split across
    micro-batches or arrive out of order BETWEEN batches. n_versions
    adds; the winner is the higher (last_seq, delete-wins) side.
    Tombstones persist so a stale pre-delete update arriving in a later
    batch cannot resurrect the key.
    """
    payload_cols = list(payload_cols)
    both = state.select(
        key, *payload_cols, "last_op", "n_versions", "last_seq"
    ).unionByName(delta.select(key, *payload_cols, "last_op", "n_versions", "last_seq"))
    op_rank = F.when(F.col("last_op") == op_delete, F.lit(1)).otherwise(F.lit(0))
    winner = F.struct(*[F.col(c) for c in payload_cols], F.col("last_op").alias("__op"))
    # same total order as cdc_net: payload is the final tiebreak
    order_key = F.struct(
        F.col("last_seq").alias("s"), op_rank.alias("r"), winner.alias("w")
    )
    return (
        both.groupBy(key)
        .agg(
            F.max_by(winner, order_key).alias("__w"),
            F.sum("n_versions").cast("long").alias("n_versions"),
            F.max("last_seq").alias("last_seq"),
        )
        .select(
            key,
            *[F.col(f"__w.{c}").alias(c) for c in payload_cols],
            F.col("__w.__op").alias("last_op"),
            "n_versions",
            "last_seq",
        )
    )
