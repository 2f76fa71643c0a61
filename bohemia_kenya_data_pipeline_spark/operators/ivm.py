"""Incremental view maintenance (IVM): keep a grouped-aggregate table
current under CDC deltas WITHOUT rescanning the fact table.

The companion to ``scd.snapshot_diff``: diff produces the delta, this
module folds it into a maintained aggregate. At 100 TB the difference
is structural — a daily full recompute scans everything, maintenance
scans only the day's delta (typically 0.01-1% of the corpus) plus the
(much smaller) aggregate state.

Supported aggregates: the self-maintainable ones — SUM, COUNT, and
anything derivable from them (AVG = SUM/COUNT). MIN/MAX are
deliberately excluded: they are not self-maintainable under deletes
(deleting the current max forces a rescan of the group) — callers who
need them keep a per-group top-N sidecar or accept recompute; the
docstring states the boundary instead of hiding a rescan inside an
"incremental" API.

Delta contract: one row per changed key with ``change_type`` in
('insert', 'delete', 'update') and BOTH value sets: ``old_<col>``
(NULL for inserts) and ``new_<col>`` (NULL for deletes) — the shape
``scd.snapshot_diff`` classifies and a CDC feed (Debezium-style
before/after images) provides directly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_state(
    df: DataFrame, group_cols: Sequence[str], sum_cols: Sequence[str]
) -> DataFrame:
    """Build the maintainable state: per group, ``n_rows`` plus
    ``sum_<col>`` for every value column. Run ONCE at bootstrap; after
    that, only :func:`apply_delta` touches it."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")] + [
        F.sum(c).alias(f"sum_{c}") for c in sum_cols
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def delta_from_snapshot_diff(
    diff: DataFrame,
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    cols: Sequence[str],
) -> DataFrame:
    """Join a ``scd.snapshot_diff`` result back to both snapshots to
    attach the before/after images IVM needs: ``old_<c>`` / ``new_<c>``
    per changed key. (A real CDC feed carries the images already; this
    helper exists for the snapshot-diff path.) Two left equi-joins on
    the key, delta-sized."""
    keys = list(key_cols)
    o = old.select(*keys, *[F.col(c).alias(f"old_{c}") for c in cols])
    n = new.select(*keys, *[F.col(c).alias(f"new_{c}") for c in cols])
    return diff.join(o, keys, "left").join(n, keys, "left")


def apply_delta(
    state: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    group_from_new: Sequence[str] | None = None,
) -> DataFrame:
    """Fold a CDC delta into the aggregate state; returns the new
    state (groups whose count drops to zero are removed).

    Each delta row contributes +new and/or -old:
    insert -> (+1, +new); delete -> (-1, -old); update -> (0,
    new - old). A key whose GROUP value itself changed must appear as
    delete+insert in the delta (snapshot_diff reports it as 'update'
    with the group column in changed_cols — split it upstream;
    ``group_from_new`` names the delta columns carrying each row's
    group when the group is not part of the key).

    Plan: one delta-sized aggregation + one outer join with the state
    on the group key. The fact table is never read.
    """
    keys = list(group_cols)
    gsrc = list(group_from_new) if group_from_new is not None else keys
    ct = F.col("change_type")
    d_n = F.when(ct == "insert", 1).when(ct == "delete", -1).otherwise(0)
    aggs = [F.sum(d_n).cast("long").alias("d_n")] + [
        F.sum(
            F.coalesce(F.col(f"new_{c}"), F.lit(0))
            - F.coalesce(F.col(f"old_{c}"), F.lit(0))
        ).alias(f"d_{c}")
        for c in sum_cols
    ]
    grouped = delta.groupBy(
        *[F.col(s).alias(k) for s, k in zip(gsrc, keys)]
    ).agg(*aggs)

    joined = state.join(grouped, keys, "full_outer")
    out_cols = [
        (F.coalesce(F.col("n_rows"), F.lit(0)) + F.coalesce(F.col("d_n"), F.lit(0)))
        .cast("long")
        .alias("n_rows")
    ] + [
        (
            F.coalesce(F.col(f"sum_{c}"), F.lit(0))
            + F.coalesce(F.col(f"d_{c}"), F.lit(0))
        ).alias(f"sum_{c}")
        for c in sum_cols
    ]
    return joined.select(*keys, *out_cols).filter(F.col("n_rows") > 0)


def join_view_delta(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_new: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str],
    sign_col: str = "__sign",
) -> DataFrame:
    """Delta of the inner equi-join view ``V = A ⋈ B`` under signed row
    deltas (``sign_col`` = +1 insert / -1 delete; an update is a
    -old/+new pair) — join-view IVM, the companion to the aggregate
    maintenance above. The fact tables are never rescanned: both terms
    are DELTA-sized joins.

    Uses the asymmetric identity

        ΔV = ΔA ⋈ B_new  ∪  A_old ⋈ ΔB

    which is exactly ``A_new⋈B_new − A_old⋈B_old`` (expand the
    product: the ΔA⋈ΔB cross term is absorbed by joining ΔA against
    B_NEW — pass the post-delta B, pre-delta A; swapping both sides'
    vintages double- or zero-counts the cross term). Output rows carry
    the multiplied sign in ``sign_col``.

    Plan: two equi-joins each with one delta-sized side — broadcast
    the delta and neither snapshot shuffles at all. Shared non-key
    columns must be renamed first (same contract as
    ``interval_overlap_join``).
    """
    keys = list(on)
    clash = (set(a_old.columns) & set(b_new.columns)) - set(keys)
    if clash:
        raise ValueError(
            f"rename shared non-key columns before joining: {sorted(clash)}"
        )
    # loud contract checks (same class as interval_overlap_join's
    # reserved-name guard): deltas must carry the sign, snapshots must
    # not — a sign column on a snapshot would silently collide with the
    # delta's in the join output
    for name, d in (("delta_a", delta_a), ("delta_b", delta_b)):
        if sign_col not in d.columns:
            raise ValueError(f"{name} is missing sign column {sign_col!r}")
    for name, s in (("a_old", a_old), ("b_new", b_new)):
        if sign_col in s.columns:
            raise ValueError(
                f"snapshot {name} must not carry sign column {sign_col!r}"
            )
    # sign of (ΔA ⋈ B_new) rows = ΔA's sign (B rows are implicit +1);
    # likewise below — signs multiply, and one side is always +1.
    # Broadcast the DELTA side: neither snapshot ever shuffles.
    da_v = F.broadcast(delta_a).join(b_new, keys, "inner")
    db_v = a_old.join(F.broadcast(delta_b), keys, "inner")
    cols = [c for c in da_v.columns]
    return da_v.select(*cols).unionByName(db_v.select(*cols))


def apply_join_view_delta(
    view: DataFrame,
    dv: DataFrame,
    sign_col: str = "__sign",
    view_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Fold a signed ``ΔV`` into the materialized view: exact multiset
    semantics — group the touched rows by FULL row value, net the
    signs, keep net > 0 copies. Retraction rows must therefore be
    bit-identical to what they retract (the standard retraction-stream
    contract; floats included — CDC before-images satisfy this by
    construction).

    Plan: only rows whose join keys appear in ``ΔV`` enter the
    net-sign aggregation (semi/anti split on the view); everything
    else passes through untouched — delta-sized work against a
    view-sized scan, no recompute of the join.

    ``view_cols`` lets a chained maintainer assert the view's column
    list instead of having it derived: ``view.columns`` re-analyzes
    the whole view lineage, which grows every batch
    (``jobs.maintain_cdc_lakehouse``, r14 — guide §3.3 planning-time
    class). Semantics are identical; the reserved-name guard runs
    against the asserted list.
    """
    if sign_col not in dv.columns:
        raise ValueError(f"delta is missing sign column {sign_col!r}")
    vcols = list(view_cols) if view_cols is not None else view.columns
    for tmp in ("__net", "__dup"):
        if tmp in vcols or tmp in dv.columns:
            raise ValueError(f"column name {tmp!r} is reserved")
    data_cols = [c for c in dv.columns if c != sign_col]
    touched = dv.select(*data_cols).dropDuplicates()
    untouched = view.join(touched, data_cols, "left_anti")
    signed_view = view.join(touched, data_cols, "left_semi").withColumn(
        sign_col, F.lit(1)
    )
    survivors = (
        signed_view.unionByName(dv.select(*data_cols, sign_col))
        .groupBy(*data_cols)
        .agg(F.sum(sign_col).alias("__net"))
        .filter(F.col("__net") > 0)
    )
    # net > 1 would mean duplicate multiset rows; re-explode to keep
    # exact multiset cardinality
    survivors = survivors.withColumn(
        "__dup", F.explode(F.sequence(F.lit(1), F.col("__net")))
    ).select(*data_cols)
    return untouched.unionByName(survivors)


def split_group_moves(
    delta: DataFrame,
    key_cols: Sequence[str],
    sum_cols: Sequence[str],
    old_group_col: str,
    new_group_col: str,
    out_group_col: str = "g",
) -> DataFrame:
    """Normalize a delta whose GROUP column itself can change: an
    'update' row whose group moved is split into an explicit delete
    (old group, -old values) + insert (new group, +new values) pair —
    the form :func:`apply_delta` requires (it credits (new - old) to
    ONE group, which is only correct when the group stayed put).
    Rows whose group did not move pass through with ``out_group_col``
    = coalesce(new, old). Null-safe on the group compare.
    """
    keys = list(key_cols)
    og, ng = F.col(old_group_col), F.col(new_group_col)
    moved = delta.filter(
        (F.col("change_type") == "update") & ~og.eqNullSafe(ng)
    )
    stay = delta.join(moved.select(*keys), keys, "left_anti").select(
        *keys, "change_type",
        *[c for pair in ((f"old_{s}", f"new_{s}") for s in sum_cols) for c in pair],
        F.coalesce(ng, og).alias(out_group_col),
    )
    as_delete = moved.select(
        *keys, F.lit("delete").alias("change_type"),
        *[F.col(f"old_{s}").alias(f"old_{s}") for s in sum_cols],
        *[F.lit(None).cast(delta.schema[f"new_{s}"].dataType).alias(f"new_{s}") for s in sum_cols],
        og.alias(out_group_col),
    )
    as_insert = moved.select(
        *keys, F.lit("insert").alias("change_type"),
        *[F.lit(None).cast(delta.schema[f"old_{s}"].dataType).alias(f"old_{s}") for s in sum_cols],
        *[F.col(f"new_{s}").alias(f"new_{s}") for s in sum_cols],
        ng.alias(out_group_col),
    )
    return stay.unionByName(as_delete).unionByName(as_insert)
