"""Slowly-changing-dimension (type 2) history merge.

The reference maintains time-versioned state as append-only dated
partitions (S9, `write_history_partition`) and reconstructs "as of"
views by snapshot expansion (W10). SCD2 is the complementary
warehouse-native form: one table with (valid_from, valid_to) validity
intervals, updated by a merge that closes changed rows and inserts
their successors. Implemented as a pure DataFrame plan (full-outer
join on the business key + null-safe change detection) so it runs on
plain parquet — no table-format dependency.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _changed(tracked_cols: Sequence[str]) -> Column:
    """Null-safe any-column-differs predicate between cur.* and upd.*."""
    out = F.lit(False)
    for c in tracked_cols:
        out = out | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
    return out


def merge_scd2(
    current: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    effective_date: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    check_unique: bool = False,
) -> DataFrame:
    """Merge a new full snapshot (``updates``: key + tracked columns)
    into an SCD2 history table. Returns the new history:

    Preconditions (like ``pack_sequences``, stated rather than silently
    repaired): ``updates`` must have at most one row per business key,
    and ``current`` at most one OPEN row (valid_to IS NULL) per key.
    A duplicate on either side multiplies rows through the full-outer
    join and emits a corrupted history (duplicate open rows). Exact
    duplicate update rows are dropped for free (deterministic);
    conflicting duplicates — same key, different tracked values — have
    no deterministic resolution here, so resolve them upstream (e.g.
    ``windows.keep_last``). Pass ``check_unique=True`` to pay one
    aggregation per side and get a loud ValueError instead of silent
    corruption; leave it off in production plans where keys are known
    unique (it triggers an eager action).

    - already-closed rows pass through untouched;
    - open rows whose tracked values changed are CLOSED
      (valid_to = effective_date) and a successor row is inserted
      (valid_from = effective_date, valid_to = NULL);
    - open rows absent from the snapshot stay open (no implicit
      deletes — close them explicitly upstream if the source is
      authoritative about removals);
    - snapshot keys not in the history are inserted as new open rows.

    One full-outer join on the business key + null-safe column
    comparison; everything is expression-level, so the merge scales
    like any equi-join (shuffle on the key, or zero-shuffle when both
    sides are bucketed on it — see tests/test_bucketing.py).
    """
    keys = list(key_cols)
    open_rows = current.filter(F.col(valid_to).isNull())
    if check_unique:
        # exact-duplicate snapshot rows are harmless noise; dropping
        # them is deterministic (all columns equal) and keeps the join
        # key unique. Gated with check_unique because it is a
        # full-width shuffle of the updates payload — the production
        # path (check_unique=False) instead REQUIRES duplicate-free
        # updates as a documented precondition.
        updates = updates.dropDuplicates()
        for name, df in (("updates", updates), ("current (open rows)", open_rows)):
            dup = (
                df.groupBy(*keys)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"merge_scd2: duplicate business key in {name}: "
                    f"{ {k: dup[0][k] for k in keys} } — resolve upstream "
                    "(e.g. windows.keep_last) before merging"
                )
    closed_rows = current.filter(F.col(valid_to).isNotNull())
    # presence of each side can't be inferred from a tracked column
    # (they may be legitimately NULL) — valid_from is non-null on every
    # current row, and the update side gets an explicit marker
    j = open_rows.alias("cur").join(
        updates.withColumn("__upd", F.lit(True)).alias("upd"), keys, "full_outer"
    )
    in_cur = F.col(f"cur.{valid_from}").isNotNull()
    in_upd = F.col("upd.__upd").isNotNull()
    chg = in_cur & in_upd & _changed(tracked_cols)

    # surviving open/closed versions of existing rows
    kept_open = j.filter(in_cur).select(
        *keys,
        *[F.col(f"cur.{c}").alias(c) for c in tracked_cols],
        F.col(f"cur.{valid_from}").alias(valid_from),
        F.when(chg, F.lit(effective_date).cast("date"))
        .otherwise(F.col(f"cur.{valid_to}"))
        .alias(valid_to),
    )
    # successor rows for changes + brand-new keys
    inserted = j.filter(chg | (in_upd & ~in_cur)).select(
        *keys,
        *[F.col(f"upd.{c}").alias(c) for c in tracked_cols],
        F.lit(effective_date).cast("date").alias(valid_from),
        F.lit(None).cast("date").alias(valid_to),
    )
    return closed_rows.select(
        *keys, *tracked_cols, valid_from, valid_to
    ).unionByName(kept_open).unionByName(inserted)


def as_of(history: DataFrame, date: str, valid_from: str = "valid_from", valid_to: str = "valid_to") -> DataFrame:
    """Point-in-time view of an SCD2 history: rows valid at ``date``
    (valid_from <= date < valid_to, open rows unbounded). A scan-local
    filter — with the history partitioned or sorted on valid_from,
    parquet min/max stats prune old segments for free.
    """
    d = F.lit(date).cast("date")
    return history.filter(
        (F.col(valid_from) <= d)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > d))
    ).drop(valid_from, valid_to)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Change-data-capture diff of two snapshots of the same table:
    one row per key that changed, with

    - ``change_type``: 'insert' (key only in ``new``), 'delete' (key
      only in ``old``), 'update' (present in both, any compared
      column differs — null-safe);
    - ``changed_cols``: comma-joined sorted names of differing
      columns ('' for insert/delete).

    Unchanged keys are dropped. ``compare_cols`` defaults to every
    shared non-key column. Same key-uniqueness precondition as
    :func:`merge_scd2` (duplicates multiply through the join), plus:
    key columns must be NON-NULL on both sides — presence is detected
    by key nullness after the outer join, so a genuinely NULL key
    would misclassify (and can never equi-join anyway).

    One full-outer equi-join on the key — shuffle on both sides or
    zero-shuffle when the snapshots are bucketed on the key; the
    column comparison is expression-level. This is the batch CDC
    primitive: its output drives merge_scd2 (updates), deletes
    cascades (clean.py), and incremental re-publish.
    """
    keys = list(key_cols)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    cmp_cols = sorted(compare_cols)

    o = old.select(*keys, *cmp_cols).alias("o")
    n = new.select(*keys, *cmp_cols).alias("n")
    cond = None
    for k in keys:
        eq = F.col(f"o.{k}") == F.col(f"n.{k}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")

    in_old = F.col(f"o.{keys[0]}").isNotNull()
    in_new = F.col(f"n.{keys[0]}").isNotNull()
    diffs = [
        F.when(
            ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")), F.lit(c)
        )
        for c in cmp_cols
    ]
    changed = F.concat_ws(",", *diffs) if diffs else F.lit("")
    change_type = (
        F.when(in_old & ~in_new, "delete")
        .when(in_new & ~in_old, "insert")
        .otherwise("update")
    )
    key_out = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys
    ]
    return (
        j.select(
            *key_out,
            change_type.alias("change_type"),
            F.when(in_old & in_new, changed).otherwise(F.lit("")).alias("changed_cols"),
        )
        .filter((F.col("change_type") != "update") | (F.col("changed_cols") != ""))
    )


def compact_cdc_log(
    log: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Last-writer-wins compaction of a CDC op log: one validated row
    per key (the entry with the highest ``seq_cols``). The shared
    first half of :func:`apply_cdc_log` and the composed lakehouse
    maintenance job (``jobs.maintain_cdc_lakehouse``) — window over
    the LOG only, never a fact table; ops outside I/U/D fail loudly
    at evaluation time (``raise_error``)."""
    from pyspark.sql.window import Window

    keys = list(key_cols)
    bad_op = F.raise_error(
        F.concat(
            F.lit("compact_cdc_log: unknown op '"),
            F.coalesce(F.col(op_col).cast("string"), F.lit("<null>")),
            F.lit("' (expected I/U/D)"),
        )
    )
    checked = log.withColumn(
        op_col,
        F.when(F.col(op_col).isin("I", "U", "D"), F.col(op_col)).otherwise(bad_op),
    )
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in seq_cols])
    return (
        checked.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_cdc_log(
    snapshot: DataFrame,
    log: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    payload_cols: Sequence[str] | None = None,
    broadcast_log: bool = True,
) -> DataFrame:
    """Apply a CDC op log (Debezium-style ``I``/``U``/``D`` row images)
    to a snapshot, producing the next snapshot — MERGE INTO semantics
    on plain parquet, the complement of :func:`snapshot_diff` (which
    derives a log; this replays one).

    Per key, only the LAST log entry in ``seq_cols`` order wins
    (log compaction): a final ``D`` drops the key even if earlier
    entries updated it; a final ``I``/``U`` upserts its row image —
    insert-vs-update is not distinguished on apply, so the operation
    is idempotent and replay-safe (applying the same log twice yields
    the same table; exactly-once delivery is NOT required of the
    transport). Deletes of absent keys and inserts of existing keys
    are no-fail upsert semantics, as in every lakehouse MERGE.

    Preconditions: ``seq_cols`` must totally order log entries within
    a key (ties are nondeterministic — ship a monotonic per-source
    sequence/LSN as the tiebreak, as CDC transports do); ops outside
    I/U/D fail the job loudly at evaluation time (``raise_error``),
    not silently.

    Plan shape — the 100 TB story: the window runs over the LOG only
    (log << snapshot, always); the snapshot is touched by exactly one
    LEFT ANTI join against the compacted key set, broadcast by default
    (``broadcast_log``), so the snapshot is never shuffled — the same
    touched-keys principle that lets table formats rewrite only
    affected files. Set ``broadcast_log=False`` for a log too big to
    broadcast; the anti-join then shuffles both sides on the key
    (bucket the snapshot on it to keep that exchange-free).
    """
    keys = list(key_cols)
    if payload_cols is None:
        payload_cols = [c for c in snapshot.columns if c not in keys]
    last = compact_cdc_log(log, keys, seq_cols, op_col)
    return _apply_compacted(
        snapshot, last, keys, list(payload_cols), op_col, broadcast_log
    )


def _apply_compacted(
    snapshot: DataFrame,
    last: DataFrame,
    keys: list[str],
    payload: list[str],
    op_col: str,
    broadcast_log: bool,
) -> DataFrame:
    """MERGE a PRE-COMPACTED log (one row per key) into the snapshot —
    the second half of :func:`apply_cdc_log`, split out so a caller
    that already compacted the batch (``jobs.maintain_cdc_lakehouse``
    needs the compacted image for its signed delta too) applies it
    without building the window subtree twice per batch."""
    touched = last.select(*keys)
    if broadcast_log:
        touched = F.broadcast(touched)
    untouched = snapshot.join(touched, keys, "left_anti")
    upserts = last.filter(F.col(op_col) != "D").select(*keys, *payload)
    return untouched.select(*keys, *payload).unionByName(upserts)


def pit_join(
    fact: DataFrame,
    history: DataFrame,
    key_cols: Sequence[str],
    fact_ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time (PIT) join — every fact row picks the ONE history
    version valid at its timestamp: ``valid_from <= ts < valid_to``
    (open rows have NULL valid_to = valid forever). The feature-store
    primitive: training examples must see dimension attributes AS OF
    the event, not today's (label leakage otherwise), and the same
    join serves "bill at the contract terms in force on the usage
    date".

    SCD2 validity intervals are disjoint per key by construction
    (merge_scd2 invariant), so each fact row matches at most one
    version — the join cannot fan out.

    Plan: equi-join on the key with the interval predicate as a
    post-join filter condition — Spark plans it as a hash join on the
    key (the selective part) with the range as a residual, which is
    the right shape: history holds FEW versions per key, so the
    residual scans a handful of rows per fact. No window, no
    per-fact sort. At 100 TB: bucket both sides on the key for a
    zero-shuffle join.
    """
    keys = list(key_cols)
    f = fact.alias("f")
    h = history.alias("h")
    cond = None
    for k in keys:
        eq = F.col(f"f.{k}") == F.col(f"h.{k}")
        cond = eq if cond is None else (cond & eq)
    ts = F.col(f"f.{fact_ts_col}")
    cond = (
        cond
        & (ts >= F.col(f"h.{valid_from}"))
        & (F.col(f"h.{valid_to}").isNull() | (ts < F.col(f"h.{valid_to}")))
    )
    out = f.join(h, cond, how)
    # fact columns + history's non-key payload columns
    h_payload = [
        c for c in history.columns if c not in keys
    ]
    return out.select(
        *[F.col(f"f.{c}") for c in fact.columns],
        *[F.col(f"h.{c}").alias(c) for c in h_payload],
    )
