"""Golden tests for the resolution/sanitation engine (C1-C11) on
ODK-shaped fixtures (FIXTURES.md schemas): keep-last SET semantics,
typed coalesce, DELETE-before-SET, parent->child cascade, repeat-key
parsing, PII drop/hash, jitter determinism, nullification."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from bohemia_kenya_data_pipeline_spark.operators import clean as cl

RES_COLS = [
    "Form", "instanceID", "Column", "Set To", "Operation",
    "RepeatName", "RepeatKey", "resolution_order",
]


_RES_SCHEMA = (
    "`Form` string, `instanceID` string, `Column` string, `Set To` string, "
    "`Operation` string, `RepeatName` string, `RepeatKey` int, "
    "`resolution_order` int"
)


def _resolution(spark, rows):
    return spark.createDataFrame(rows, _RES_SCHEMA)


def _main(spark):
    return spark.createDataFrame(
        [
            ("uuid:a", "uuid:a", "00001", "NGUZ0", 30.0),
            ("uuid:b", "uuid:b", "00002", "nguzo", 40.0),
            ("uuid:c", "uuid:c", "00003", "KIJIJI", 50.0),
        ],
        ["instanceID", "KEY", "hhid", "village", "age"],
    )


def _repeat(spark):
    return spark.createDataFrame(
        [
            ("uuid:a", "uuid:a/repeat_individual[1]", "00001-01", 10.0),
            ("uuid:a", "uuid:a/repeat_individual[2]", "00001-02", 20.0),
            ("uuid:b", "uuid:b/repeat_individual[1]", "00002-01", 30.0),
            ("uuid:c", "uuid:c/repeat_individual[1]", "00003-01", 40.0),
        ],
        ["PARENT_KEY", "KEY", "extid", "age"],
    )


def test_repeat_key_parsing(spark):
    parts = cl.with_repeat_parts(_repeat(spark)).select(
        "KEY", "repeat_name", "repeat_key"
    ).collect()
    by_key = {r.KEY: (r.repeat_name, r.repeat_key) for r in parts}
    assert by_key["uuid:a/repeat_individual[2]"] == ("repeat_individual", 2)


def test_set_keep_last_and_typed_coalesce(spark):
    # two SETs on the same cell -> later resolution_order wins; numeric
    # string cast to the column's double type; untouched rows keep old.
    res = _resolution(
        spark,
        [
            ("f", "uuid:a", "age", "77", "SET", "", 0, 1),
            ("f", "uuid:a", "age", "88.5", "SET", "", 0, 2),
            ("f", "uuid:b", "village", "FIXED", "SET", "", 0, 1),
        ],
    )
    out = {r.instanceID: r for r in cl.apply_sets(_main(spark), res).collect()}
    assert out["uuid:a"].age == 88.5
    assert out["uuid:a"].village == "NGUZ0"
    assert out["uuid:b"].village == "FIXED"
    assert out["uuid:c"].age == 50.0


def test_delete_before_set(spark):
    # DELETE supersedes SET on the same instance (processing_utils.R:403-429)
    res = _resolution(
        spark,
        [
            ("f", "uuid:a", None, None, "DELETE", "", 0, 1),
            ("f", "uuid:a", "village", "GHOST", "SET", "", 0, 2),
            ("f", "uuid:b", "village", "KEPT", "SET", "", 0, 1),
        ],
    )
    rows = cl.google_sheets_fix(_main(spark), res, "f").collect()
    ids = {r.instanceID for r in rows}
    assert ids == {"uuid:b", "uuid:c"}
    assert {r.village for r in rows if r.instanceID == "uuid:b"} == {"KEPT"}


def test_parent_delete_cascades_to_repeat(spark):
    # parent DELETE removes all its children; repeat-level DELETE
    # removes exactly one ordinal (processing_utils.R:335-400)
    res = _resolution(
        spark,
        [
            ("f", "uuid:b", None, None, "DELETE", "", 0, 1),
            ("f", "uuid:a", None, None, "DELETE", "repeat_individual", 2, 1),
        ],
    )
    kept = cl.apply_deletes(_repeat(spark), res, "f", repeat_name="repeat_individual")
    keys = {r.KEY for r in kept.collect()}
    assert keys == {"uuid:a/repeat_individual[1]", "uuid:c/repeat_individual[1]"}


def test_set_on_repeat_rows(spark):
    # SET addressed by (instanceID=PARENT_KEY, RepeatName, RepeatKey)
    res = _resolution(
        spark,
        [("f", "uuid:a", "age", "99", "SET", "repeat_individual", 2, 1)],
    )
    out = {
        r.KEY: r.age
        for r in cl.apply_sets(_repeat(spark), res, repeat_name="repeat_individual").collect()
    }
    assert out["uuid:a/repeat_individual[2]"] == 99.0
    assert out["uuid:a/repeat_individual[1]"] == 10.0


def test_expand_resolution_recode(spark):
    res = _resolution(
        spark,
        [("efficacy", "uuid:a", "person_absent_reason", "Absent", "SET", "", 0, 1)],
    )
    out = cl.expand_resolution(res)
    got = {(r["Column"], r["Set To"]) for r in out.collect()}
    assert ("person_absent", "1") in got
    assert ("migrated_status", "0") in got
    assert ("person_absent_reason", "Absent") in got  # original kept
    assert out.count() == 1 + 5  # 1 original + 5 cascade targets


def test_pii_drop_and_hash(spark):
    df = _repeat(spark)
    dropped = cl.drop_pii(df, ["extid", "not_here"])
    assert "extid" not in dropped.columns
    hashed = cl.hash_pii(df, ["extid"])
    vals = [r.extid for r in hashed.collect()]
    assert all(len(v) == 40 for v in vals)  # sha1 hex


def test_jitter_same_group_same_offset(spark):
    df = spark.createDataFrame(
        [("00001", 1.0, 36.0), ("00001", 1.5, 36.5), ("00002", 2.0, 37.0)],
        ["hhid", "Latitude", "Longitude"],
    )
    out = cl.jitter_locations(df).collect()
    off = {(r.hhid, round(r.Latitude - lat, 9)) for r, lat in zip(out, [1.0, 1.5, 2.0])}
    # both rows of hhid 00001 moved by the identical offset
    assert len({o for h, o in off if h == "00001"}) == 1
    # jitter bounded by the radius
    assert all(abs(o) <= 0.01 for _, o in off)


def test_nullify_rows(spark):
    out = cl.nullify_rows(_main(spark), "instanceID", ["uuid:b"], ["instanceID", "KEY"])
    row = {r.instanceID: r for r in out.collect()}
    assert row["uuid:b"].village is None and row["uuid:b"].age is None
    assert row["uuid:b"].KEY == "uuid:b"
    assert row["uuid:a"].village == "NGUZ0"


def test_standardize_and_typos(spark):
    df = spark.createDataFrame([(" nguz0  town ",)], ["village"])
    out = cl.fix_typos(
        cl.standardize_strings(df, ["village"]), "village", {"NGUZ0 TOWN": "NGUZO TOWN"}
    )
    assert out.collect()[0].village == "NGUZO TOWN"


def test_set_mixed_null_and_empty_repeat_coords_no_fanout(spark):
    # regression: NULL vs '' RepeatName (and NULL RepeatKey) encodings
    # for the same cell must collapse to ONE pivot row — not fan the
    # join out into duplicate data rows.
    res = spark.createDataFrame(
        [
            ("f", "uuid:a", "age", "77", "SET", None, None, 1),
            ("f", "uuid:a", "age", "88.5", "SET", "", 0, 2),
        ],
        _RES_SCHEMA,
    )
    out = cl.apply_sets(_main(spark), res)
    assert out.count() == 3  # no duplication
    assert {r.age for r in out.collect() if r.instanceID == "uuid:a"} == {88.5}


def test_delete_other_form_does_not_leak(spark):
    # regression: a DELETE recorded for another form must not remove
    # this form's rows sharing the instanceID.
    res = _resolution(
        spark,
        [
            ("other_form", "uuid:a", None, None, "DELETE", "", 0, 1),
            ("f", "uuid:b", None, None, "DELETE", "", 0, 1),
        ],
    )
    kept = {r.instanceID for r in cl.apply_deletes(_main(spark), res, "f").collect()}
    assert kept == {"uuid:a", "uuid:c"}
    # repeat path: parent cascade also form-scoped
    kept_rep = {
        r.KEY
        for r in cl.apply_deletes(
            _repeat(spark), res, "f", repeat_name="repeat_individual"
        ).collect()
    }
    assert "uuid:a/repeat_individual[1]" in kept_rep  # other form's DELETE ignored
    assert not any(k.startswith("uuid:b/") for k in kept_rep)


def test_repeat_ops_preserve_data_side_metadata_columns(spark):
    # regression: a data-side form_id column (e.g. from read_form_tree)
    # must survive the repeat DELETE/SET paths untouched.
    from pyspark.sql import functions as F

    rep = _repeat(spark).withColumn("form_id", F.lit("from_ingest"))
    res = _resolution(
        spark, [("f", "uuid:a", None, None, "DELETE", "repeat_individual", 2, 1)]
    )
    out = cl.apply_deletes(rep, res, "f", repeat_name="repeat_individual")
    assert "form_id" in out.columns
    assert {r.form_id for r in out.collect()} == {"from_ingest"}
    res2 = _resolution(
        spark, [("f", "uuid:a", "age", "99", "SET", "repeat_individual", 2, 1)]
    )
    out2 = cl.apply_sets(rep, res2, repeat_name="repeat_individual")
    assert {r.form_id for r in out2.collect()} == {"from_ingest"}


def test_merge_scd2_branches(spark):
    import datetime

    from pyspark.sql import functions as F

    from bohemia_kenya_data_pipeline_spark.operators.scd import merge_scd2

    d = datetime.date
    current = spark.createDataFrame(
        [
            (1, "same", d(2000, 1, 1), None),        # unchanged -> stays open
            (2, "old", d(2000, 1, 1), None),         # changed -> closes + successor
            (3, "gone", d(2000, 1, 1), None),        # absent from snapshot -> stays open
            (2, "older", d(1999, 1, 1), d(2000, 1, 1)),  # already closed -> untouched
        ],
        "k INT, v STRING, valid_from DATE, valid_to DATE",
    )
    updates = spark.createDataFrame(
        [(1, "same"), (2, "new"), (5, "brand")], "k INT, v STRING"
    )
    out = merge_scd2(current, updates, ["k"], ["v"], "2001-06-01")
    rows = {(r.k, r.v): (r.valid_from, r.valid_to) for r in out.collect()}
    eff = d(2001, 6, 1)
    assert rows[(1, "same")] == (d(2000, 1, 1), None)
    assert rows[(2, "old")] == (d(2000, 1, 1), eff)      # closed
    assert rows[(2, "new")] == (eff, None)               # successor
    assert rows[(3, "gone")] == (d(2000, 1, 1), None)    # no implicit delete
    assert rows[(2, "older")] == (d(1999, 1, 1), d(2000, 1, 1))  # untouched
    assert rows[(5, "brand")] == (eff, None)             # new key
    assert len(rows) == 6


def test_merge_scd2_null_safe_change_detection(spark):
    import datetime

    from bohemia_kenya_data_pipeline_spark.operators.scd import merge_scd2

    d = datetime.date
    current = spark.createDataFrame(
        [(1, None, d(2000, 1, 1), None), (2, "x", d(2000, 1, 1), None)],
        "k INT, v STRING, valid_from DATE, valid_to DATE",
    )
    updates = spark.createDataFrame([(1, None), (2, None)], "k INT, v STRING")
    out = merge_scd2(current, updates, ["k"], ["v"], "2001-06-01")
    rows = sorted(((r.k, r.v, r.valid_to) for r in out.collect()), key=repr)
    # NULL == NULL is "unchanged" (eqNullSafe); x -> NULL is a change
    assert rows == sorted(
        [(1, None, None), (2, None, None), (2, "x", d(2001, 6, 1))], key=repr
    )

def test_merge_scd2_uniqueness_guard(spark):
    import datetime

    import pytest

    from bohemia_kenya_data_pipeline_spark.operators.scd import merge_scd2

    d = datetime.date
    current = spark.createDataFrame(
        [(1, "a", d(2000, 1, 1), None)], "k INT, v STRING, valid_from DATE, valid_to DATE"
    )
    # with check_unique, exact-duplicate update rows are deduped before
    # the key check: no row multiplication, no false duplicate-key error.
    # (The production path check_unique=False REQUIRES duplicate-free
    # updates — the dedup is a full-width shuffle, so it rides the same
    # opt-in flag as the key check.)
    updates = spark.createDataFrame(
        [(1, "b"), (1, "b"), (2, "c"), (2, "c")], "k INT, v STRING"
    )
    out = merge_scd2(current, updates, ["k"], ["v"], "2001-06-01", check_unique=True)
    assert out.count() == 3  # closed (1,a) + successor (1,b) + new (2,c)

    # conflicting duplicates (same key, different values) raise loudly
    conflicting = spark.createDataFrame([(1, "b"), (1, "z")], "k INT, v STRING")
    with pytest.raises(ValueError, match="duplicate business key"):
        merge_scd2(current, conflicting, ["k"], ["v"], "2001-06-01", check_unique=True)

    # duplicate OPEN rows in the history are caught too
    dup_open = spark.createDataFrame(
        [(1, "a", d(2000, 1, 1), None), (1, "a2", d(2000, 2, 1), None)],
        "k INT, v STRING, valid_from DATE, valid_to DATE",
    )
    clean_updates = spark.createDataFrame([(2, "c")], "k INT, v STRING")
    with pytest.raises(ValueError, match="duplicate business key"):
        merge_scd2(dup_open, clean_updates, ["k"], ["v"], "2001-06-01", check_unique=True)


# ---------------------------------------------------------------------------
# scd.snapshot_diff (CDC)
# ---------------------------------------------------------------------------


def test_snapshot_diff_classifies_all_change_types(spark):
    from bohemia_kenya_data_pipeline_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, s string, v int"
    )
    new = spark.createDataFrame(
        [(2, "b", 25), (3, "c", 30), (4, "d", 40)], "k int, s string, v int"
    )
    got = {r.k: (r.change_type, r.changed_cols) for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        1: ("delete", ""),
        2: ("update", "v"),
        4: ("insert", ""),
    }  # key 3 unchanged -> absent


def test_snapshot_diff_null_safe_compare(spark):
    from bohemia_kenya_data_pipeline_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, "x")], "k int, s string")
    new = spark.createDataFrame([(1, None), (2, None)], "k int, s string")
    got = {r.k: (r.change_type, r.changed_cols) for r in snapshot_diff(old, new, ["k"]).collect()}
    # NULL == NULL is unchanged; x -> NULL is an update
    assert got == {2: ("update", "s")}


def test_snapshot_diff_multi_changed_cols_sorted(spark):
    from bohemia_kenya_data_pipeline_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame([(1, "a", 1)], "k int, zcol string, acol int")
    new = spark.createDataFrame([(1, "b", 2)], "k int, zcol string, acol int")
    got = snapshot_diff(old, new, ["k"]).collect()[0]
    assert got.changed_cols == "acol,zcol"  # sorted by column name


def test_pit_join_picks_version_valid_at_ts(spark):
    import datetime as dt

    from bohemia_kenya_data_pipeline_spark.operators.scd import pit_join

    hist = spark.createDataFrame(
        [
            (1, "v1", dt.date(2020, 1, 1), dt.date(2021, 1, 1)),
            (1, "v2", dt.date(2021, 1, 1), None),
            (2, "only", dt.date(2020, 6, 1), None),
        ],
        "k int, attr string, valid_from date, valid_to date",
    )
    fact = spark.createDataFrame(
        [
            (10, 1, dt.date(2020, 6, 15)),   # inside v1
            (11, 1, dt.date(2021, 1, 1)),    # boundary: v1 closes, v2 opens
            (12, 1, dt.date(2019, 1, 1)),    # before history -> NULL
            (13, 2, dt.date(2022, 1, 1)),    # open version
            (14, 3, dt.date(2022, 1, 1)),    # unknown key -> NULL
        ],
        "fid int, k int, ts date",
    )
    got = {r.fid: r.attr for r in pit_join(fact, hist, ["k"], "ts").collect()}
    assert got == {10: "v1", 11: "v2", 12: None, 13: "only", 14: None}
    # disjoint intervals -> no fan-out
    assert pit_join(fact, hist, ["k"], "ts").count() == 5


def test_apply_cdc_log_merge_semantics(spark):
    # last-writer-wins per key (ts, then seq LSN tiebreak): a final D
    # drops the key despite earlier updates; a final U after a D
    # resurrects it; unknown keys insert; absent-key deletes no-op
    from bohemia_kenya_data_pipeline_spark.operators.scd import apply_cdc_log

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k BIGINT, v STRING"
    )
    log = spark.createDataFrame(
        [
            (1, "U", 10, 1, "a2"),
            (1, "D", 10, 2, None),   # same ts — seq breaks the tie: D wins
            (2, "D", 10, 3, None),
            (2, "U", 11, 4, "b2"),   # later ts resurrects
            (4, "I", 12, 5, "new"),  # unknown key inserts
            (9, "D", 13, 6, None),   # absent-key delete no-ops
        ],
        "k BIGINT, op STRING, ts BIGINT, seq BIGINT, v STRING",
    )
    out = apply_cdc_log(snap, log, ["k"], ["ts", "seq"])
    assert sorted((r.k, r.v) for r in out.collect()) == [
        (2, "b2"), (3, "c"), (4, "new")
    ]
    # replay-safe: applying the same log to the result changes nothing
    again = apply_cdc_log(out, log, ["k"], ["ts", "seq"])
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))


def test_apply_cdc_log_unknown_op_fails_loud(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from bohemia_kenya_data_pipeline_spark.operators.scd import apply_cdc_log

    snap = spark.createDataFrame([(1, "a")], "k BIGINT, v STRING")
    log = spark.createDataFrame(
        [(1, "X", 1, 1, "z")], "k BIGINT, op STRING, ts BIGINT, seq BIGINT, v STRING"
    )
    with pytest.raises((Py4JJavaError, PySparkException), match="unknown op"):
        apply_cdc_log(snap, log, ["k"], ["ts", "seq"]).collect()


def test_apply_cdc_log_snapshot_never_shuffled(spark):
    # plan pin for the 100 TB story: the snapshot side reaches the
    # anti join without an exchange (broadcast touched-keys), and with
    # broadcast_log=False the join becomes a shuffle join instead
    from bohemia_kenya_data_pipeline_spark.operators.scd import apply_cdc_log

    snap = spark.range(1000).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("v")
    )
    log = spark.createDataFrame(
        [(5, "D", 1, 1, None)], "k BIGINT, op STRING, ts BIGINT, seq BIGINT, v STRING"
    )
    plan = (
        apply_cdc_log(snap, log, ["k"], ["ts", "seq"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    plan2 = (
        apply_cdc_log(snap, log, ["k"], ["ts", "seq"], broadcast_log=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" not in plan2.split("LeftAnti")[0] or "SortMergeJoin" in plan2


def test_k_anonymity_report_and_suppress(spark):
    from pyspark.sql import functions as F

    from bohemia_kenya_data_pipeline_spark.operators import clean as cl

    df = spark.createDataFrame(
        [("v1", 30, i) for i in range(5)]
        + [("v1", 40, 10), ("v1", 40, 11)]
        + [("v2", 30, 20)]
        + [(None, 30, 30), (None, 30, 31), (None, 30, 32)],
        "village STRING, age_band INT, row_id INT",
    )
    rep = {
        (r.village, r.age_band): (r.n, r.risky)
        for r in cl.k_anonymity_report(df, ["village", "age_band"], k=3).collect()
    }
    assert rep[("v1", 30)] == (5, False)
    assert rep[("v1", 40)] == (2, True)
    assert rep[("v2", 30)] == (1, True)
    # NULL quasi-values form their own equivalence class
    assert rep[(None, 30)] == (3, False)

    kept = cl.suppress_small_groups(df, ["village", "age_band"], k=3)
    ids = sorted(r.row_id for r in kept.collect())
    # the NULL class (size 3) survives: the join is null-safe
    assert ids == [0, 1, 2, 3, 4, 30, 31, 32]
    assert kept.columns == df.columns

    import pytest

    with pytest.raises(ValueError):
        cl.k_anonymity_report(df, [], k=3)

    # k=1: nothing suppressed
    assert cl.suppress_small_groups(df, ["village"], k=1).count() == df.count()
