"""Structural audit of the DuckDB oracle SQL output types (VERDICT r13
asks 2-3).

The driver materializes oracle results via pandas/arrow, where DuckDB's
HUGEINT (the type of an uncast ``SUM(BIGINT)``) becomes float64 — 662.0
— while the Spark side returns BIGINT 662. The driver's value hash
distinguishes int from float, so rows+schema come back green with a
hash mismatch (the exact ``orc_roundtrip_docs`` signature in
CORRECTNESS_r12/r13). The builder's ``gate.py`` historically compared
via ``fetchall()`` (HUGEINT -> exact Python int, and ``662 == 662.0``
is True in Python), so the gate was structurally blind to the class.

Two defenses, both here:

1. A type-level scan: no registered oracle may emit a HUGEINT /
   UHUGEINT / DECIMAL output column. Integer sums must be
   ``CAST(... AS BIGINT)``; decimal arithmetic must be cast to DOUBLE.
   (Binding only — ``rel.types`` plans without executing, so scanning
   every registered oracle runs in seconds.)
2. A regression-style demonstration that the gate's driver-faithful
   arrow pass (``gate._duck_rows_arrow`` + ``gate._norm_faithful``)
   catches the class that plain equality cannot — i.e. the r13 failure
   is now locally reproducible.

Same spirit as the round-13 ``gettempdir()`` structural guard in
tests/test_lifecycle_tmp.py: make the failure class unwritable, not
just fixed.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gate  # noqa: E402
from bohemia_kenya_data_pipeline_spark.queries import ORACLES  # noqa: E402

#: DuckDB logical types whose values survive every materialization path
#: (fetchall, .df(), .arrow()) with the same Python class as the Spark
#: collect() of the matching Spark type. Anything outside this set is a
#: driver-hash hazard: HUGEINT -> float64 via .df() / decimal128 via
#: .arrow(); DECIMAL -> float64 via .df() but Decimal via fetchall.
_FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")


def test_no_hugeint_or_decimal_oracle_columns(duck):
    """Every registered oracle's output schema is free of the types
    that materialize differently across DuckDB client paths."""
    offenders = []
    for name, sql in sorted(ORACLES.items()):
        rel = duck.sql(sql)
        for col, ty in zip(rel.columns, rel.types):
            ty_s = str(ty).upper()
            if any(bad in ty_s for bad in _FORBIDDEN):
                offenders.append((name, col, ty_s))
    assert not offenders, (
        "oracle output columns with driver-hash-hazard types (wrap the "
        "expression in CAST(... AS BIGINT) for integer sums or "
        "CAST(... AS DOUBLE) for decimal arithmetic): "
        f"{offenders}"
    )


def test_faithful_compare_catches_uncast_hugeint_sum():
    """The r12/r13 orc_roundtrip_docs failure class, reproduced: an
    uncast DuckDB SUM passes plain value equality (662 == 662.0 /
    Decimal('662')) but fails the gate's driver-faithful class-tagged
    compare. Pre-r14, gate.py had only the plain pass — this test
    pins the harness fix that makes the class locally visible."""
    con = duckdb.connect()
    rel = con.sql("SELECT SUM(x) AS sum_len FROM (VALUES (1), (661)) t(x)")
    assert "HUGEINT" in str(rel.types[0]).upper()

    # plain-equality path (the old gate): blind to the class split
    plain_duck = gate._norm(rel.fetchall()[0][0])
    assert plain_duck == 662  # int(662) == the Spark-side BIGINT

    # driver-faithful path: arrow materialization + class tags
    du_f = gate._duck_rows_arrow(con.sql("SELECT SUM(x) AS sum_len FROM (VALUES (1), (661)) t(x)"), ["sum_len"])
    sp_f = [(gate._norm_faithful(662),)]  # Spark BIGINT row
    assert sp_f != du_f, "faithful compare must flag uncast HUGEINT"

    # and the fix pattern passes both
    fixed = con.sql(
        "SELECT CAST(SUM(x) AS BIGINT) AS sum_len FROM (VALUES (1), (661)) t(x)"
    )
    assert gate._duck_rows_arrow(fixed, ["sum_len"]) == sp_f


def test_faithful_compare_catches_decimal_vs_double():
    """DECIMAL oracle columns paired with Spark DOUBLE were green only
    because both happened to reach float64 through the driver's pandas
    path — brittle under a duckdb/arrow version change (arrow exports
    decimal128). The faithful pass flags the pairing; the explicit
    CAST(... AS DOUBLE) convention (audio_spectral_features,
    price_histogram as of r14) passes it."""
    con = duckdb.connect()
    dec = con.sql("SELECT ROUND(CAST(2 AS BIGINT) * 25000.0, 1) AS bin_lo")
    assert "DECIMAL" in str(dec.types[0]).upper()
    sp_f = [(gate._norm_faithful(50000.0),)]  # Spark DOUBLE row
    assert gate._duck_rows_arrow(dec, ["bin_lo"]) != sp_f

    dbl = con.sql(
        "SELECT CAST(ROUND(CAST(2 AS BIGINT) * 25000.0, 1) AS DOUBLE) AS bin_lo"
    )
    assert gate._duck_rows_arrow(dbl, ["bin_lo"]) == sp_f


def test_faithful_norm_agrees_on_safe_types():
    """No false positives on the safe type set: BIGINT, DOUBLE (incl.
    NaN), VARCHAR, DATE, TIMESTAMP, BOOLEAN, NULL, and LIST all
    class-match between arrow materialization and Spark collect()
    Python values."""
    import datetime

    con = duckdb.connect()
    rel = con.sql(
        """
        SELECT CAST(7 AS BIGINT) AS i, CAST(1.5 AS DOUBLE) AS f,
               CAST('nan' AS DOUBLE) AS nf, 'abc' AS s,
               DATE '2024-02-29' AS d,
               TIMESTAMP '2024-02-29 12:34:56' AS ts,
               TRUE AS b, CAST(NULL AS BIGINT) AS z,
               [1, 2, 3] AS arr
        """
    )
    cols = sorted(rel.columns)
    du_f = gate._duck_rows_arrow(rel, cols)
    spark_row = {
        "i": 7,
        "f": 1.5,
        "nf": float("nan"),
        "s": "abc",
        "d": datetime.date(2024, 2, 29),
        "ts": datetime.datetime(2024, 2, 29, 12, 34, 56),
        "b": True,
        "z": None,
        "arr": [1, 2, 3],
    }
    sp_f = [tuple(gate._norm_faithful(spark_row[c]) for c in cols)]
    assert sp_f == du_f


@pytest.mark.parametrize("name", ["orc_roundtrip_docs", "jsonl_roundtrip_docs"])
def test_roundtrip_oracles_cast_their_sums(name):
    """The three r14-fixed oracles stay fixed: their SUMs are cast."""
    sql = ORACLES[name].upper()
    assert "CAST(SUM(LENGTH(TEXT)) AS BIGINT)" in sql
    assert "CAST(SUM(N_CHARS) AS BIGINT)" in sql


def test_hybrid_rank_fusion_oracle_casts_rrf_nanos():
    assert "CAST(SUM(C_NANOS) AS BIGINT)" in ORACLES["hybrid_rank_fusion"].upper()


def test_faithful_norm_structs_compare_by_content():
    """Latent-class guard (round-14 self-review): a Spark struct column
    collects as a Row (a tuple subclass) while DuckDB STRUCT arrives
    as a dict — containers differ even when content matches. The
    faithful normalizer maps both to the same sorted key/value shape,
    so the first struct oracle (none exist today) compares by content
    instead of spuriously FAIL-ARROWing."""
    import datetime

    from pyspark.sql import Row

    sp = Row(a=1, b="x", d=datetime.date(2024, 2, 29))
    du = {"b": "x", "a": 1, "d": datetime.date(2024, 2, 29)}
    assert gate._norm_faithful(sp) == gate._norm_faithful(du)
    assert gate._norm_faithful(Row(a=1)) != gate._norm_faithful({"a": 1.0})


def test_nullable_integer_columns_are_not_flagged():
    """The driver is SYMMETRIC under pandas degradation: five
    driver-green entries carry NULLs in integer output columns
    (nullable int -> float64/NaN on BOTH sides), so the faithful pass
    must NOT flag NULL-bearing BIGINT — arrow keeps exact int/None,
    matching Spark collect()."""
    con = duckdb.connect()
    rel = con.sql(
        "SELECT * FROM (VALUES (CAST(1 AS BIGINT)), (NULL)) t(v)"
    )
    du_f = gate._duck_rows_arrow(rel, ["v"])
    sp_f = sorted(
        [(gate._norm_faithful(1),), (gate._norm_faithful(None),)], key=repr
    )
    assert sp_f == du_f
