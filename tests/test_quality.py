"""Golden tests for quality.py: P8 name normalization (incl.
collisions), P9 empty-column drop, ragged detector consolidation."""

from __future__ import annotations

from bohemia_kenya_data_pipeline_spark.operators import quality as ql


def test_normalize_column_names_keeps_last_segment(spark):
    df = spark.createDataFrame(
        [(1, 2, 3)], ["group_a-sub-hhid", "group_b-extid", "plain"]
    )
    assert ql.normalize_column_names(df).columns == ["hhid", "extid", "plain"]


def test_normalize_column_names_disambiguates_collisions(spark):
    df = spark.createDataFrame([(1, 2)], ["a-x", "b-x"])
    assert ql.normalize_column_names(df).columns == ["x", "x_2"]


def test_drop_empty_columns(spark):
    df = spark.createDataFrame(
        [(1, None, "a"), (2, None, None)],
        "id int, all_null string, partial string",
    )
    out = ql.drop_empty_columns(df)
    assert out.columns == ["id", "partial"]
    assert out.count() == 2


def test_consolidate_ragged_union_and_contract(spark):
    d1 = spark.createDataFrame(
        [("k1", "f", "a1", "desc1", "w9")],
        "KEY string, form_id string, anomalies_id string, "
        "anomalies_description string, anomalies_reports_to_wid string",
    )
    d2 = spark.createDataFrame(
        [("k2", "f", "a2", "desc2")],
        "KEY string, form_id string, anomalies_id string, anomalies_description string",
    )
    out = ql.consolidate([d1, d2])
    rows = {r.resolution_id: r for r in out.collect()}
    assert set(rows) == {"f__k1__a1", "f__k2__a2"}
    # missing column NULL-filled then ''-normalized
    assert rows["f__k2__a2"].anomalies_reports_to_wid == ""
    assert rows["f__k1__a1"].anomalies_reports_to_wid == "w9"
    assert all(r.resolution_status == "to_do" for r in rows.values())


def test_normalize_names_collision_with_real_column(spark):
    # regression: disambiguated 'x_2' must not collide with a real x_2
    df = spark.createDataFrame([(1, 2, 3)], ["a-x", "b-x", "x_2"])
    cols = ql.normalize_column_names(df).columns
    assert len(set(cols)) == 3 and cols[0] == "x"


def test_detect_duplication_percent_in_column_name(spark):
    df = spark.createDataFrame([("k1", "v"), ("k2", "v")], ["KEY", "pct%done"])
    rows = ql.detect_duplication(df, "pct%done", "f", "dup").collect()
    assert len(rows) == 2
    assert rows[0].anomalies_description == "pct%done:v duplicated 2 times"


def test_detect_threshold_rejects_unknown_direction(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("k", 1.0)], ["KEY", "v"])
    with _pytest.raises(ValueError, match="direction"):
        ql.detect_threshold(df, "v", "f", "a", "d", 0.5, direction="greater")


def test_inconsistent_group_counts_null_as_value(spark):
    from bohemia_kenya_data_pipeline_spark.operators import quality as ql

    df = spark.createDataFrame(
        [("h1", None, "k1"), ("h1", "5", "k2"), ("h2", "7", "k3"), ("h2", "7", "k4"),
         (None, "9", "k5")],
        ["hhid", "cluster", "KEY"],
    )
    out = ql.detect_inconsistent_group(df, "hhid", "cluster", "f", "multi")
    rows = {r.KEY for r in out.collect()}
    # {NULL, '5'} is a disagreement (R n_distinct counts NA); {7,7} is
    # not; NULL group keys never flag
    assert rows == {"h1"}


def test_data_dictionary_empty_table_zero_nulls(spark):
    from bohemia_kenya_data_pipeline_spark.operators import quality as ql

    empty = spark.createDataFrame([], "a INT, b STRING")
    rows = {r.column: r for r in ql.data_dictionary(empty).collect()}
    assert rows["a"].n_rows == 0 and rows["a"].n_null == 0
    assert rows["b"].n_null == 0


# ---------------------------------------------------------------------------
# check_expectations
# ---------------------------------------------------------------------------


def _exp_df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A", "ok-1"),
            (2, None, "B", "ok-2"),
            (2, 500.0, "C", "bad"),
            (None, -5.0, "A", None),
        ],
        "id int, amt double, cat string, code string",
    )


def test_expectations_row_rules(spark):
    from bohemia_kenya_data_pipeline_spark.operators import quality as ql

    got = {
        (r.rule, r.column): (r.n_violations, r.n_rows, r.passed)
        for r in ql.check_expectations(
            _exp_df(spark),
            [
                ql.expect_not_null("id"),
                ql.expect_in_range("amt", 0, 100),  # NULL passes; 500 & -5 fail
                ql.expect_values_in("cat", ["A", "B"]),
                ql.expect_regex("code", r"^ok-"),  # NULL passes; 'bad' fails
            ],
        ).collect()
    }
    assert got[("not_null", "id")] == (1, 4, False)
    assert got[("in_range[0,100]", "amt")] == (2, 4, False)
    assert got[("values_in[A,B]", "cat")] == (1, 4, False)
    assert got[("regex[^ok-]", "code")] == (1, 4, False)


def test_expectations_unique_and_fk(spark):
    from bohemia_kenya_data_pipeline_spark.operators import quality as ql

    df = _exp_df(spark)
    ref = spark.createDataFrame([(1,), (2,)], "k int")
    got = {
        r.rule: (r.n_violations, r.passed)
        for r in ql.check_expectations(
            df,
            [
                ql.expect_unique("id"),
                ql.expect_foreign_key("id", ref, "k"),
            ],
        ).collect()
    }
    # ids: 1,2,2,NULL -> NULL row exempt (SQL UNIQUE convention);
    # 3 non-null rows, 2 distinct -> exactly 1 violation
    assert got["unique"] == (1, False)
    fk = got["foreign_key[k]"]
    assert fk == (0, True)  # NULL passes FK; 1 and 2 both present


def test_expectations_row_rules_single_pass_plan(spark):
    """All row-level rules must fold into ONE aggregation over the
    table — no per-rule scan."""
    from bohemia_kenya_data_pipeline_spark.operators import quality as ql

    df = _exp_df(spark)
    out = ql.check_expectations(
        df,
        [
            ql.expect_not_null("id"),
            ql.expect_in_range("amt", 0, 100),
            ql.expect_values_in("cat", ["A", "B"]),
        ],
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1  # the source appears once


def test_expectations_condition_escape_hatch(spark):
    from pyspark.sql import functions as F

    from bohemia_kenya_data_pipeline_spark.operators import quality as ql

    got = ql.check_expectations(
        _exp_df(spark),
        [ql.expect_condition("amt_lt_1000", "amt", F.coalesce(F.col("amt"), F.lit(0)) < 1000)],
    ).collect()[0]
    assert (got.rule, got.n_violations, got.passed) == ("amt_lt_1000", 0, True)


def test_expectations_unique_multiple_nulls_exempt(spark):
    from bohemia_kenya_data_pipeline_spark.operators import quality as ql

    df = spark.createDataFrame([(1,), (2,), (2,), (None,), (None,)], "id int")
    r = ql.check_expectations(df, [ql.expect_unique("id")]).collect()[0]
    assert (r.n_violations, r.n_rows, r.passed) == (1, 5, False)


def test_quarantine_split_first_reason_wins_and_partitions(spark):
    from pyspark.sql import functions as F

    from bohemia_kenya_data_pipeline_spark.operators import quality as ql

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (None, 999.0), (4, 500.0)], "id int, amt double"
    )
    rules = [
        ql.expect_not_null("id"),
        ql.expect_in_range("amt", 0, 100),
    ]
    good, bad = ql.quarantine_split(df, rules)
    # row 3 fails BOTH rules -> first rule's name wins
    reasons = {r.id: r.quarantine_reason for r in bad.collect()}
    assert reasons == {None: "not_null", 4: "in_range[0,100]"}
    assert sorted(r.id for r in good.collect()) == [1, 2]  # NULL amt passes range
    assert "quarantine_reason" not in good.columns


def test_null_predicate_convention_matches_across_apis(spark):
    # A custom expect_condition whose Column yields NULL must be
    # classified the same way by check_expectations (violation count)
    # and quarantine_split (row routing): NULL == violation.
    from pyspark.sql import functions as F

    from bohemia_kenya_data_pipeline_spark.operators import quality as ql

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id int, amt double"
    )
    # amt > 0 evaluates to NULL on row 2 — not null-safe on purpose
    rule = ql.expect_condition("amt_positive", "amt", F.col("amt") > 0)
    r = ql.check_expectations(df, [rule]).collect()[0]
    good, bad = ql.quarantine_split(df, [rule])
    assert r.n_violations == bad.count() == 2  # NULL row + negative row
    assert sorted(x.id for x in good.collect()) == [1]


def test_quarantine_split_rejects_table_level_rules(spark):
    import pytest as _pytest

    from bohemia_kenya_data_pipeline_spark.operators import quality as ql

    df = spark.createDataFrame([(1,)], "id int")
    with _pytest.raises(ValueError, match="row-level"):
        ql.quarantine_split(df, [ql.expect_unique("id")])


def test_expectations_empty_rules_rejected(spark):
    import pytest as _pytest

    from bohemia_kenya_data_pipeline_spark.operators import quality as ql

    df = spark.createDataFrame([(1,)], "id int")
    with _pytest.raises(ValueError, match="at least one rule"):
        ql.check_expectations(df, [])


def test_safety_detector_pack_each_rule_fires_exactly(spark):
    """Handcrafted fixture where each of the six safety.R rules fires
    on a known set of rows — checks descriptions, key ordering, the
    KEY=PARENT_KEY contract of the leaver rules, and the consolidated
    resolution schema."""
    from bohemia_kenya_data_pipeline_spark.operators import quality as ql

    safety = spark.createDataFrame(
        [
            # (KEY, hhid, visit, cluster, wid, accuracy, geo_cluster_num)
            ("k1", "00001", 1, 10, "w1", 5.0, 20),   # dup (v1,hh1) with k2
            ("k2", "00001", 1, 10, "w1", 5.0, 20),
            ("k3", "00002", 1, 11, "w2", 20.0, 4),   # accuracy>15, geo in list
            ("k4", "00002", 2, 12, "w2", 5.0, None), # 2nd cluster for hh2; geo NULL
            ("k5", "00003", 1, 13, "w3", 5.0, 21),   # parent of the leaver rows
        ],
        "KEY string, hhid string, visit int, cluster int, wid string,"
        " accuracy double, geo_cluster_num int",
    )
    # 4 distinct Died extids + 4 distinct Absent under k5 -> rules 3+4
    child_rows = [("k5", f"d{i}", "Died") for i in range(4)]
    child_rows += [("k5", f"a{i}", "Absent") for i in range(4)]
    child_rows += [("k5", "x1", ""), ("k1", "y1", "Migrated")]
    child = spark.createDataFrame(
        child_rows, "PARENT_KEY string, extid string, person_absent_reason string"
    )
    out = ql.safety_detector_pack(safety, child).collect()
    by_rule: dict[str, list] = {}
    for r in out:
        by_rule.setdefault(r.anomalies_id, []).append(r)

    dup = by_rule["hh_visit_already_in_dataset"]
    assert sorted(r.KEY for r in dup) == ["k1", "k2"]
    assert all("please check these keys k1,k2" in r.anomalies_description
               for r in dup)

    multi = by_rule["hh_detected_multiple_clusters"]
    assert sorted(r.KEY for r in multi) == ["k3", "k4"]
    assert all("instanceIDs: k3,k4" in r.anomalies_description for r in multi)

    died = by_rule["hh_more_than_3_members_died_or_migrated"]
    assert [r.KEY for r in died] == ["k5"]  # KEY = PARENT_KEY, deduped
    assert "members 4 died and 0 migrated" in died[0].anomalies_description
    assert "extids: a0,a1,a2,a3,d0,d1,d2,d3" in died[0].anomalies_description

    absent = by_rule["hh_more_than_3_members_absent"]
    assert [r.KEY for r in absent] == ["k5"]
    assert "members 4 absent" in absent[0].anomalies_description

    assert [r.KEY for r in by_rule["hh_gps_accuracy_too_high"]] == ["k3"]
    assert "too high: 20" in by_rule["hh_gps_accuracy_too_high"][0].anomalies_description

    geo = by_rule["hh_outside_cluster"]
    assert sorted(r.KEY for r in geo) == ["k3", "k4"]  # in-list + NULL

    # consolidated contract
    assert out[0].asDict().keys() == {
        "resolution_id", "KEY", "form_id", "anomalies_id",
        "anomalies_description", "resolution_status",
        "anomalies_reports_to_wid",
    }
    assert all(r.resolution_status == "to_do" for r in out)
    assert all(r.resolution_id == f"{r.form_id}__{r.KEY}__{r.anomalies_id}"
               for r in out)


def test_pk_detector_pack_each_rule_fires_exactly(spark):
    """Handcrafted fixture where each of the seven pk.R rules fires on
    a known set of rows — checks the mapping source-of-truth join, the
    (pk_id, visit_day) dup grain, NULL-pk exemption, and the preserved
    reference rule-id typos."""
    from bohemia_kenya_data_pipeline_spark.operators import quality as ql

    day0 = spark.createDataFrame(
        [
            # (KEY, hhid, cluster, wid, pk_id, extid)
            ("d1", "00001", 1, "w1", "P1", "E1"),  # dup pk with d2
            ("d2", "00001", 1, "w1", "P1", "E1"),
            ("d3", "00002", 2, "w2", "P2", "E2"),  # hh2: clusters 2 and 3
            ("d4", "00002", 3, "w2", "P3", "E3"),
            ("d5", "00003", 4, "w3", None, "E4"),  # NULL pk: exempt from dups
            ("d6", "00003", 4, "w3", None, "E4"),
        ],
        "KEY string, hhid string, cluster int, wid string, pk_id string,"
        " extid string",
    )
    days = spark.createDataFrame(
        [
            # (KEY, hhid, cluster, wid, visit_day, pk_id, extid)
            ("x1", "00005", 5, "w5", 1, "P2", "E9"),  # mismatch vs E2 (x1,x2)
            ("x2", "00005", 5, "w5", 2, "P2", "E8"),  # mismatch vs E2
            ("x3", "00005", 5, "w5", 1, "P3", "E7"),  # mismatch vs E3 but n=1
            ("x4", "00006", 6, "w6", 1, "P1", "E1"),  # dup (P1, day 1) w/ x5
            ("x5", "00006", 7, "w6", 1, "P1", "E1"),  # also hh6 multi-cluster
            ("x6", "00006", 6, "w6", 2, "P1", "E1"),  # same pk, other day: no dup
        ],
        "KEY string, hhid string, cluster int, wid string, visit_day int,"
        " pk_id string, extid string",
    )
    fu = spark.createDataFrame(
        [
            ("f1", "w7", "P9", "E2"),  # dup pk with f2 (P9 not in day0: no mm)
            ("f2", "w7", "P9", "E2"),
            ("f3", "w8", "P2", "E5"),  # mismatch vs E2 — but n=1: silent
        ],
        "KEY string, wid string, pk_id string, extid string",
    )
    out = ql.pk_detector_pack(day0, days, fu).collect()
    by = {}
    for r in out:
        by.setdefault((r.form_id, r.anomalies_id), []).append(r)

    dup0 = by[("pkday0", "pk_id_duplicates")]
    assert sorted(r.KEY for r in dup0) == ["d1", "d2"]
    assert all("keys d1,d2" in r.anomalies_description for r in dup0)

    assert sorted(r.KEY for r in by[("pkday0", "hh_detected_multiple_clusters")]) == ["d3", "d4"]
    assert sorted(r.KEY for r in by[("pkdays123", "hh_detected_multiple_clusters")]) == ["x4", "x5", "x6"]

    dup123 = by[("pkdays123", "pk_id_duplicates")]
    assert sorted(r.KEY for r in dup123) == ["x4", "x5"]  # x6 is day 2

    dupfu = by[("pkfollowup", "pkfollowup_id_duplicates")]
    assert sorted(r.KEY for r in dupfu) == ["f1", "f2"]

    mm = by[("pkdays123", "pkdays123_mapping_mistmach")]
    assert sorted(r.KEY for r in mm) == ["x1", "x2"]  # x3's pk has n=1
    assert any("extids:E9 and E2" in r.anomalies_description for r in mm)

    assert ("pkfollowup", "pkdfollowup_mapping_mistmach") not in by  # n=1 only
    assert all(r.resolution_status == "to_do" for r in out)


def test_efficacy_pfu_safetynew_v0_packs_fire_exactly(spark):
    """Small fixtures for the four remaining detector files — with the
    six-file set this makes detector coverage instance-faithful for
    every reference detector."""
    import datetime as dt

    from bohemia_kenya_data_pipeline_spark.operators import quality as ql

    eff = spark.createDataFrame(
        [
            # KEY, hhid, visit, extid, cluster, wid, validity, tdiff, acc
            ("e1", "00001", 1, "X1", 1, "w", "invalid", 30, 5.0),
            ("e2", "00001", 1, "X2", 1, "w", "invalid", 30, 5.0),  # pair -> r1
            ("e3", "00002", 1, "X3", 2, "w", "invalid", 5, 20.0),  # alone: no r1; r2+r4
            ("e4", "00003", 1, "X4", 3, "w", "valid", 30, 5.0),
            ("e5", "00003", 1, "X4", 4, "w", "", 30, 5.0),  # dup extid + multi-cluster
        ],
        "KEY string, hhid string, visit int, extid string, cluster int,"
        " wid string, control_validity string, rdt_time_diff int,"
        " accuracy double",
    )
    out = ql.efficacy_detector_pack(eff).collect()
    by = {}
    for r in out:
        by.setdefault(r.anomalies_id, []).append(r.KEY)
    assert sorted(by["hh_2_rdt_invalid"]) == ["e1", "e2"]
    assert by["hh_rdt_time_diff_less_than_10_mins"] == ["e3"]
    assert sorted(by["ind_visit_already_in_dataset"]) == ["e4", "e5"]
    assert by["hh_gps_accuracy_too_high"] == ["e3"]
    assert sorted(by["hh_detected_multiple_clusters"]) == ["e4", "e5"]

    pfu = spark.createDataFrame(
        [
            ("p1", "00001", 1, 1, "w"),
            ("p2", "00001", 1, 1, "w"),  # dup (visit, hhid)
            ("p3", "00002", 1, 2, "w"),
            ("p4", "00002", 2, 3, "w"),  # multi-cluster hh2
        ],
        "KEY string, hhid string, visit int, cluster int, wid string",
    )
    rows = ql.pfu_detector_pack(pfu).collect()
    dup = [r for r in rows if r.anomalies_id == "extid_visit_already_in_dataset"]
    assert sorted(r.KEY for r in dup) == ["p1", "p2"]
    # reference prints the hhid in the extid slot — preserved verbatim
    assert all(r.anomalies_description.startswith("extid:00001 ") for r in dup)

    sn = spark.createDataFrame(
        [
            ("s1", "00001", 1, 1, "w", 5.0, 20),
            ("s2", "00002", 1, 2, "w", 20.0, 4),    # gps + outside (in list)
            ("s3", "00003", 1, 3, "w", 5.0, None),  # outside (NULL geo)
        ],
        "KEY string, hhid string, visit int, cluster int, wid string,"
        " accuracy double, geo_cluster_num int",
    )
    snc = spark.createDataFrame(
        [("c1", "s1", "E1"), ("c2", "s1", "E1"), ("c3", "s2", "E2")],
        "KEY string, PARENT_KEY string, extid string",
    )
    rows = ql.safetynew_detector_pack(sn, snc).collect()
    by = {}
    for r in rows:
        by.setdefault(r.anomalies_id, []).append(r)
    ind = by["ind_visit_already_in_dataset"]
    assert sorted(r.KEY for r in ind) == ["c1", "c2"]  # CHILD keys kept
    assert all(r.anomalies_description.startswith("exitd:E1 ") for r in ind)
    assert [r.KEY for r in by["hh_gps_accuracy_too_high"]] == ["s2"]
    assert sorted(r.KEY for r in by["hh_outside_cluster"]) == ["s2", "s3"]
    assert "hh_detected_multiple_clusters" not in by

    base = dt.datetime(2026, 1, 1)
    demo = spark.createDataFrame(
        [
            ("v1", "00001", "mud", "concrete", base, base + dt.timedelta(minutes=10), 5.0),
            ("v2", "00002", "wood", "iron", base, base + dt.timedelta(minutes=2), 5.0),
            ("v3", "00003", "mud", "iron", base, base + dt.timedelta(minutes=10), 20.0),
            ("v4", "00003", "brick", "iron", base, base + dt.timedelta(minutes=10), 5.0),
        ],
        "KEY string, hhid string, house_wall string, house_roof string,"
        " start_time timestamp, end_time timestamp, Accuracy double",
    )
    kid = spark.createDataFrame(
        [("k1", 105), ("k2", 50)], "KEY string, age int"
    )
    rows = ql.v0_detector_pack(demo, kid).collect()
    by = {}
    for r in rows:
        by.setdefault(r.anomalies_id, []).append(r)
    assert [r.KEY for r in by["hh_strange_materials"]] == ["v1"]
    assert [r.KEY for r in by["hh_completed_in_less_than_4_mins"]] == ["v2"]
    assert sorted(r.KEY for r in by["hh_duplicated"]) == ["v3", "v4"]
    assert [r.KEY for r in by["hh_gps_accuracy_too_high"]] == ["v3"]
    assert [r.KEY for r in by["hh_individual_age_too_high"]] == ["k1"]
    assert all(r.anomalies_reports_to_wid == "" for r in rows)  # v0: no wid


# ---------------------------------------------------------------------------
# Gopher quality rules (text.gopher_quality_flags)
# ---------------------------------------------------------------------------


def _gopher(spark, docs):
    from bohemia_kenya_data_pipeline_spark.operators import text as tx

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {r.doc_id: r for r in tx.gopher_quality_flags(df).collect()}


def test_gopher_clean_doc_passes(spark):
    clean = " ".join(
        ["the quick brown fox jumps over the lazy dog and that have with be to of"]
        * 5
    )  # 80 words, all alpha, plenty of required words
    got = _gopher(spark, [(1, clean)])[1]
    assert got.pass_gopher
    assert got.n_words == 80 and got.flag_word_count
    assert got.n_required_words == 8


def test_gopher_short_doc_fails_word_count_only_that_rule(spark):
    got = _gopher(spark, [(1, "the cat sat and that have with be")])[1]
    assert not got.flag_word_count and not got.pass_gopher
    assert got.flag_required_words and got.flag_alpha_words


def test_gopher_symbol_ratio_rule(spark):
    base = ("word " * 60).strip()
    noisy = base + " " + "#" * 10  # 61 words, 10 '#' -> ratio >= 0.1
    got = _gopher(spark, [(1, noisy)])[1]
    assert got.n_symbol == 10 and not got.flag_symbol_ratio
    ok = base + " ##"  # 2 symbols over 61 words -> fine
    assert _gopher(spark, [(2, ok)])[2].flag_symbol_ratio


def test_gopher_ellipsis_counts_as_symbol_and_line_rule(spark):
    text = "\n".join(["the good line that it is..."] * 2 + ["plain line here"])
    got = _gopher(spark, [(1, text)])[1]
    assert got.n_ellipsis == 2 and got.n_lines == 3
    assert not got.flag_ellipsis_lines  # 2/3 > 0.3


def test_gopher_bullet_line_rule(spark):
    bullets = "\n".join(["- item one", "- item two", "• item three", "tail"])
    got = _gopher(spark, [(1, bullets)])[1]
    assert got.n_bullet == 3 and got.n_lines == 4
    assert got.flag_bullet_lines  # 3/4 = 0.75 < 0.9 -> still passes
    # every line a bullet (1.0 >= 0.9) -> fails
    allb = "\n".join(["- a", "- b"])
    assert not _gopher(spark, [(2, allb)])[2].flag_bullet_lines


def test_gopher_alpha_words_rule(spark):
    nums = ("123 456 " * 30).strip()  # 60 words, zero alphabetic
    got = _gopher(spark, [(1, nums)])[1]
    assert got.n_alpha_words == 0 and not got.flag_alpha_words


def test_gopher_mean_word_length_rule(spark):
    tiny = ("a b " * 30).strip()  # mean length 1 < 3
    got = _gopher(spark, [(1, tiny)])[1]
    assert not got.flag_mean_word_len
    long_words = ("extraordinarily " * 55).strip()  # mean 16 > 10
    assert not _gopher(spark, [(2, long_words)])[2].flag_mean_word_len


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence (text.js_divergence)
# ---------------------------------------------------------------------------


def _jsd(spark, base_docs, cur_docs):
    from bohemia_kenya_data_pipeline_spark.operators import text as tx

    b = spark.createDataFrame([(t,) for t in base_docs], ["text"])
    c = spark.createDataFrame([(t,) for t in cur_docs], ["text"])
    return tx.js_divergence(b, c).collect()[0]


def test_jsd_identical_corpora_is_zero(spark):
    docs = ["alpha beta gamma", "beta gamma delta delta"]
    r = _jsd(spark, docs, docs)
    assert r.jsd_bits == 0.0
    assert r.n_terms_base == r.n_terms_cur == r.n_shared == 4


def test_jsd_disjoint_corpora_is_one_bit(spark):
    r = _jsd(spark, ["aa bb cc"], ["xx yy zz"])
    assert abs(r.jsd_bits - 1.0) < 1e-6  # disjoint supports -> max JSD (base 2)
    assert r.n_shared == 0


def test_jsd_partial_overlap_between_zero_and_one(spark):
    r = _jsd(spark, ["aa bb aa bb"], ["aa bb xx yy"])
    assert 0.0 < r.jsd_bits < 1.0
    assert r.n_shared == 2


def test_jsd_symmetric(spark):
    a, b = ["aa bb cc cc"], ["bb cc dd"]
    assert abs(_jsd(spark, a, b).jsd_bits - _jsd(spark, b, a).jsd_bits) < 1e-9


# ---------------------------------------------------------------------------
# URL featurization (text.url_features)
# ---------------------------------------------------------------------------


def _urls(spark, urls):
    from bohemia_kenya_data_pipeline_spark.operators import text as tx

    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], ["i", "url"])
    return {r.i: r for r in tx.url_features(df).collect()}


def test_url_features_full_parse(spark):
    r = _urls(spark, ["https://user:p@www.news.example.co.uk:8080/a/b/c?x=1&y=2#frag"])[0]
    assert r.scheme == "https"
    assert r.host == "www.news.example.co.uk"  # userinfo + port stripped
    assert r.registrable_domain == "example.co.uk"  # PSL-aware
    assert r.tld == "uk"
    assert r.path_depth == 3
    assert r.n_query_params == 2


def test_url_features_simple_and_bare(spark):
    got = _urls(spark, ["http://example.com", "ftp://a.b.c.org/x", "not a url"])
    assert got[0].registrable_domain == "example.com" and got[0].path_depth == 0
    assert got[1].registrable_domain == "c.org" and got[1].scheme == "ftp"
    assert got[2].host == "" and got[2].registrable_domain == ""
    assert got[2].n_query_params == 0


# ---------------------------------------------------------------------------
# Tokenizer codegen-safety (round-7: bpe_ish_tokens F.filter -> array_remove)
# ---------------------------------------------------------------------------


def test_bpe_ish_tokens_golden(spark):
    """Parity golden for the round-7 array_remove rewrite: punctuation
    split off as its own tokens, no empty tokens, empty/whitespace-only
    input yields an empty array (the interpreted F.filter lambda it
    replaced had identical semantics)."""
    from pyspark.sql import functions as F

    from bohemia_kenya_data_pipeline_spark.operators import text as tx

    df = spark.createDataFrame(
        [
            (0, "Hello, world! It's 9am."),
            (1, "  spaced   out  "),
            (2, ""),
            (3, "   "),
            (4, "no-punct words only"),
        ],
        ["i", "text"],
    )
    got = {r.i: list(r.t) for r in df.select("i", tx.bpe_ish_tokens("text").alias("t")).collect()}
    assert got[0] == ["Hello", ",", "world", "!", "It", "'", "s", "9am", "."]
    assert got[1] == ["spaced", "out"]
    assert got[2] == []
    assert got[3] == []
    assert got[4] == ["no", "-", "punct", "words", "only"]
    # the codegen invariant: no higher-order filter lambda in the expression
    expr = str(df.select(tx.bpe_ish_tokens("text").alias("t"))._jdf.queryExecution().analyzed())
    assert "array_remove" in expr and "filter(" not in expr.lower().replace("pushedfilters", "")


def test_quality_classifier_score_separates_planted_vocab(spark):
    import math

    from pyspark.sql import functions as F

    from bohemia_kenya_data_pipeline_spark.operators import text as tx

    # positive docs speak "good", negative docs speak "bad"; one doc
    # has no vocabulary token at all and must keep the prior
    rows = (
        [(i, "good good signal", 1) for i in range(6)]
        + [(100 + i, "bad bad noise", 0) for i in range(4)]
        + [(999, "", 1)]
    )
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, label INT")
    out = tx.quality_classifier_score(
        df, label=F.col("label") == 1, vocab_size=8
    )
    got = {r.doc_id: r for r in out.collect()}
    assert len(got) == 11
    assert got[0].pred is True and got[0].score > 0
    assert got[100].pred is False and got[100].score < 0
    # zero-vocab-token doc: score == prior = ln(7/4)
    assert got[999].n_vocab_tokens == 0
    assert abs(got[999].score - math.log(7 / 4)) < 1e-6
    # occurrences count (multinomial): "good good signal" = 3 tokens
    assert got[0].n_vocab_tokens == 3


def test_quality_classifier_vocab_cap_is_deterministic(spark):
    from pyspark.sql import functions as F

    from bohemia_kenya_data_pipeline_spark.operators import text as tx

    # 4 tokens with equal frequency, cap 2 -> lexicographically first
    # two survive; rarer discriminative token is dropped by the cap
    df = spark.createDataFrame(
        [(1, "aa bb", 1), (2, "cc dd", 0), (3, "aa bb cc dd rare", 1)],
        "doc_id BIGINT, text STRING, label INT",
    )
    out = tx.quality_classifier_score(df, label=F.col("label") == 1, vocab_size=2)
    got = {r.doc_id: r for r in out.collect()}
    # vocab = {aa, bb} (count 2 each, ties break by token asc over cc/dd
    # which also have count 2 -> aa, bb win lexicographically)
    assert got[1].n_vocab_tokens == 2
    assert got[2].n_vocab_tokens == 0
    assert got[3].n_vocab_tokens == 2


def test_group_quantile_gate_per_group_floor(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(1, 9)] + [("b", 100 * i) for i in range(1, 5)],
        "src STRING, score INT",
    )
    kept, report = ql.group_quantile_gate(df, "src", "score", q=0.25)
    rep = {r.group: r for r in report.collect()}
    # group a: quantile_cont(0.25) over 1..8 = 2.75 -> keep 3..8
    assert rep["a"].threshold == 2.75
    assert rep["a"].n_total == 8 and rep["a"].n_kept == 6
    assert rep["a"].kept_share_ppm == 750000
    # group b: 100,200,300,400 -> q25 = 175 -> keep 200,300,400
    assert rep["b"].threshold == 175.0 and rep["b"].n_kept == 3
    # kept frame preserves original columns only
    assert kept.columns == ["src", "score"]
    assert kept.filter("src = 'a'").agg({"score": "min"}).first()[0] == 3


def test_group_quantile_gate_null_group_and_name_collisions(spark):
    # NULL group = a real stratum (review finding): its rows must be
    # gated against their OWN threshold, never silently dropped
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("a", 4),
         (None, 10), (None, 20), (None, 30), (None, 40)],
        "src STRING, score INT",
    )
    kept, report = ql.group_quantile_gate(df, "src", "score", q=0.25)
    rep = {r.group: r for r in report.collect()}
    assert rep[None].n_total == 4 and rep[None].n_kept == 3
    assert rep[None].threshold == 17.5  # q25 of 10,20,30,40
    assert sorted(r.score for r in kept.filter("src IS NULL").collect()) == [20, 30, 40]

    # user columns named 'group'/'threshold' survive the gate intact
    from pyspark.sql import functions as F2

    df2 = spark.createDataFrame(
        [("a", 5, "g1", 99.0), ("a", 6, "g2", 98.0), ("a", 7, "g3", 97.0), ("a", 8, "g4", 96.0)],
        "src STRING, score INT, group STRING, threshold DOUBLE",
    )
    kept2, rep2 = ql.group_quantile_gate(df2, "src", "score", q=0.25)
    assert kept2.columns == ["src", "score", "group", "threshold"]
    assert kept2.count() == 3
    assert {r.group for r in kept2.collect()} <= {"g1", "g2", "g3", "g4"}
    # even gating BY a column named 'group' works (no ambiguous refs):
    # every stratum has one row, q50 == the value, so all rows survive
    kept3, rep3 = ql.group_quantile_gate(df2, "group", "score", q=0.5)
    assert kept3.count() == 4 and rep3.count() == 4


def test_group_quantile_gate_zero_kept_group_still_reported(spark):
    """ADVICE r11: a group whose score_col is entirely NULL gets a NULL
    threshold, so score >= NULL keeps none of its rows. That group must
    still SURFACE in the report (threshold NULL, n_kept 0) instead of
    vanishing through an inner join — the silent drop must be visible."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("a", 4),
         ("dead", None), ("dead", None)],
        "src STRING, score INT",
    )
    kept, report = ql.group_quantile_gate(df, "src", "score", q=0.25)
    rep = {r.group: r for r in report.collect()}
    assert set(rep) == {"a", "dead"}  # zero-kept group is reported
    assert rep["dead"].threshold is None
    assert rep["dead"].n_total == 2 and rep["dead"].n_kept == 0
    assert rep["dead"].kept_share_ppm == 0
    assert kept.filter("src = 'dead'").count() == 0
    # the healthy group is unaffected by the left join
    assert rep["a"].n_kept == 3 and rep["a"].kept_share_ppm == 750000


def test_quality_classifier_pred_derives_from_rounded_score(spark):
    """ADVICE r11: pred must compare the ROUNDED score (the hashed
    contract column), not the raw partition-order-dependent float sum —
    a balanced corpus whose score is exactly 0 pins the boundary:
    round(0, 6) > 0 is False on both engines, whereas a raw sum could
    land at ±1e-18 and flip."""
    from pyspark.sql import functions as F

    from bohemia_kenya_data_pipeline_spark.operators import text as tx

    # identical text in both classes -> every token weight is exactly 0
    # and the prior is ln(1/1) = 0 -> score rounds to 0.0 exactly
    df = spark.createDataFrame(
        [(1, "same same text", 1), (2, "same same text", 0)],
        "doc_id BIGINT, text STRING, label INT",
    )
    out = tx.quality_classifier_score(df, label=F.col("label") == 1, vocab_size=4)
    for r in out.collect():
        assert r.score == 0.0 and r.pred is False
        # the invariant the oracle hash relies on:
        assert r.pred == (r.score > 0)
