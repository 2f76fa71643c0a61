"""Golden tests for the RDT state machine — hand-traced flowchart
branches (evaluate_rdts.R:82-135) the synthetic-cohort oracle may hit
only sparsely."""

from __future__ import annotations

import datetime

from bohemia_kenya_data_pipeline_spark.operators import stats as st

D = datetime.date


def _run(spark, rows):
    df = spark.createDataFrame(
        rows,
        "extid string, visit_number int, todays_date date, pan_result string, "
        "pf_result string, child_took_coartem string",
    )
    out = st.evaluate_rdts(df)
    return {
        (r.extid, r.visit_number): (r.incident_case, r.days_since_prev_visit, r.days_at_risk)
        for r in out.collect()
    }


def test_enrollment_and_pan_positive(spark):
    got = _run(
        spark,
        [
            ("a", 1, D(2024, 1, 1), "Negative", "Negative", "no"),
            ("a", 2, D(2024, 2, 1), "Positive", "", "no"),
        ],
    )
    assert got[("a", 1)] == (False, None, None)
    assert got[("a", 2)] == (True, 31.0, 31.0)


def test_coartem_subtracts_14_days_at_risk(spark):
    got = _run(
        spark,
        [
            ("a", 1, D(2024, 1, 1), "Positive", "", "yes"),
            ("a", 2, D(2024, 2, 1), "", "Negative", "no"),
        ],
    )
    assert got[("a", 2)] == (False, 31.0, 17.0)


def test_pf_positive_after_skipped_visit_is_incident(spark):
    got = _run(
        spark,
        [
            ("a", 1, D(2024, 1, 1), "", "Positive", "no"),
            ("a", 3, D(2024, 3, 1), "", "Positive", "no"),
        ],
    )
    assert got[("a", 3)][0] is True  # visit 3 after visit 1 -> skipped


def test_consecutive_pf_positive_treated_is_not_incident(spark):
    # prev pf Positive + prev coartem yes + consecutive -> ongoing
    # treated infection, NOT a new case
    got = _run(
        spark,
        [
            ("a", 1, D(2024, 1, 1), "", "Positive", "yes"),
            ("a", 2, D(2024, 2, 1), "", "Positive", "no"),
        ],
    )
    assert got[("a", 2)][0] is False


def test_consecutive_pf_positive_untreated_is_incident(spark):
    got = _run(
        spark,
        [
            ("a", 1, D(2024, 1, 1), "", "Positive", "no"),
            ("a", 2, D(2024, 2, 1), "", "Positive", "no"),
        ],
    )
    assert got[("a", 2)][0] is True


def test_blank_results_stay_unknown_then_resolve(spark):
    # visit 2 all-blank -> unknown (NULL); visit 3 pf+ after unknown
    # with prev pf blank -> incident (prev_pf != Positive branch)
    got = _run(
        spark,
        [
            ("a", 1, D(2024, 1, 1), "Negative", "Negative", "no"),
            ("a", 2, D(2024, 2, 1), "", "", "no"),
            ("a", 3, D(2024, 3, 1), "", "Positive", "no"),
        ],
    )
    assert got[("a", 2)][0] is None
    assert got[("a", 3)][0] is True
