"""Composed CDC lakehouse job (jobs.maintain_cdc_lakehouse, VERDICT r7
ask 5): after EVERY batch of a chained run, each maintained artifact
must equal its from-scratch recompute — fact == log replay, view ==
fact ⋈ dim, agg == aggregate_state(view) — and the guards fail loud."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bohemia_kenya_data_pipeline_spark import jobs
from bohemia_kenya_data_pipeline_spark.operators import ivm, scd


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def world(spark):
    fact = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 200), (3, 20, 300), (4, 30, 400)],
        "k BIGINT, ckey BIGINT, cents BIGINT",
    )
    dim = spark.createDataFrame(
        [(10, "A"), (20, "B"), (30, "C")], "ckey BIGINT, seg STRING"
    )
    return fact, dim


def _batches(spark):
    schema = "k BIGINT, ckey BIGINT, cents BIGINT, seq BIGINT, op STRING"
    b1 = spark.createDataFrame(
        [
            (5, 20, 500, 1, "I"),   # novel key
            (1, 10, 150, 1, "U"),   # row-image update
            (3, 20, 300, 1, "D"),   # delete
            (2, 10, 200, 1, "U"),   # upsert with UNCHANGED payload
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (5, 30, 550, 2, "U"),   # group move: dim key changes A/B->C
            (1, 10, 160, 2, "U"),   # second update of same key
            (9, 10, 900, 2, "U"),   # U on absent key = upsert
        ],
        schema,
    )
    b3 = spark.createDataFrame(
        [
            (5, 30, 550, 3, "D"),   # delete the batch-1 insert
            (3, 20, 333, 3, "I"),   # re-insert a deleted key
            (7, 99, 700, 3, "I"),   # key with NO dim match (view untouched)
        ],
        schema,
    )
    return [b1, b2, b3]


def test_maintained_equals_recompute_after_every_batch(spark, world):
    fact0, dim = world
    view = fact0.join(dim, ["ckey"])
    agg = ivm.aggregate_state(view, ["seg"], ["cents"])
    fact = fact0
    for i, log in enumerate(_batches(spark), 1):
        fact, view, agg = jobs.maintain_cdc_lakehouse(
            fact, view, agg, dim, log,
            key_cols=["k"], seq_cols=["seq"], join_on=["ckey"],
            group_cols=["seg"], sum_cols=["cents"],
        )
        # fact == direct sequential MERGE replay
        want_fact = fact0
        for lg in _batches(spark)[:i]:
            want_fact = scd.apply_cdc_log(want_fact, lg, ["k"], ["seq"])
        assert _rows(fact) == _rows(want_fact), f"fact diverged at batch {i}"
        # view == fact' ⋈ dim recomputed
        assert _rows(view.select("ckey", "k", "cents", "seg")) == _rows(
            want_fact.join(dim, ["ckey"]).select("ckey", "k", "cents", "seg")
        ), f"view diverged at batch {i}"
        # agg == aggregate_state(view') recomputed
        assert _rows(agg.select("seg", "n_rows", "sum_cents")) == _rows(
            ivm.aggregate_state(
                want_fact.join(dim, ["ckey"]), ["seg"], ["cents"]
            ).select("seg", "n_rows", "sum_cents")
        ), f"agg diverged at batch {i}"
    # the chain actually exercised every op class: final state checks
    got = {r.k: (r.ckey, r.cents) for r in fact.collect()}
    assert got == {
        1: (10, 160),  # updated twice
        2: (10, 200),  # unchanged upsert survived
        3: (20, 333),  # deleted then re-inserted
        4: (30, 400),  # untouched
        7: (99, 700),  # inserted, no dim match
        9: (10, 900),  # upsert-on-absent
    }
    # and key 7 (no dim row) is in the FACT but not the VIEW
    assert view.filter(F.col("k") == 7).count() == 0


def test_lakehouse_guards(spark, world):
    fact, dim = world
    view = fact.join(dim, ["ckey"])
    agg = ivm.aggregate_state(view, ["seg"], ["cents"])
    log = _batches(spark)[0]
    kw = dict(
        key_cols=["k"], seq_cols=["seq"], join_on=["ckey"],
        group_cols=["seg"], sum_cols=["cents"],
    )
    with pytest.raises(ValueError, match="must not carry sign"):
        jobs.maintain_cdc_lakehouse(
            fact.withColumn("__sign", F.lit(1)), view, agg, dim, log, **kw
        )
    with pytest.raises(ValueError, match="rename shared"):
        jobs.maintain_cdc_lakehouse(
            fact.withColumn("seg", F.lit("X")), view, agg, dim, log, **kw
        )


def test_check_contract_validates_asserted_payload(spark):
    # ADVICE r14: an explicit payload_cols that does not match the real
    # fact/view schema must fail LOUDLY when check_contract is on.
    from pyspark.sql import functions as F

    from bohemia_kenya_data_pipeline_spark import jobs
    from bohemia_kenya_data_pipeline_spark.operators import ivm

    fact = spark.createDataFrame([(1, 10, 5)], "k INT, ckey INT, cents INT")
    dim = spark.createDataFrame([(10, "A")], "ckey INT, seg STRING")
    view = fact.join(dim, ["ckey"])
    agg = ivm.aggregate_state(view, ["seg"], ["cents"])
    log = spark.createDataFrame(
        [(1, 10, 7, 1, "U")], "k INT, ckey INT, cents INT, seq INT, op STRING"
    )
    kw = dict(
        key_cols=["k"], seq_cols=["seq"], join_on=["ckey"],
        group_cols=["seg"], sum_cols=["cents"],
    )
    # correct assertion passes
    jobs.maintain_cdc_lakehouse(
        fact, view, agg, dim, log, payload_cols=["ckey", "cents"],
        check_contract=True, **kw,
    )
    # wrong payload fails loudly instead of corrupting the folds
    import pytest as _pytest

    with _pytest.raises(ValueError, match="contract violated"):
        jobs.maintain_cdc_lakehouse(
            fact, view, agg, dim, log, payload_cols=["ckey"],
            check_contract=True, **kw,
        )
    # view not matching the asserted fact+dim payload also fails
    with _pytest.raises(ValueError, match="contract violated"):
        jobs.maintain_cdc_lakehouse(
            fact, view.drop("seg"), agg, dim, log,
            payload_cols=["ckey", "cents"], check_contract=True, **kw,
        )
