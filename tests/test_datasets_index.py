"""Static datasets index — dominant institution/collection codes and
the index-file assembly (reference
idigbio_workers/generate_static_datasets_index.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from idb_backend_spark.operators import aggregates as agg


@pytest.mark.parametrize(
    "raw,expect",
    [
        ("Alpha Museum (AM)", "am"),
        # digits in the parens fail [a-zA-Z]+ — whole string falls through
        ("Lab (A1)", "lab (a1)"),
        (" Plain ", "plain"),
        # greedy .* means the LAST trailing parens group wins
        ("X (ab)(cd)", "cd"),
        # parens not at the end: no match, whole string lowered
        ("paren(s) inside", "paren(s) inside"),
    ],
)
def test_true_ic(spark, raw, expect):
    got = (
        spark.createDataFrame([(raw,)], "v string")
        .select(agg.true_ic(F.col("v")).alias("o"))
        .collect()[0]["o"]
    )
    assert got == expect


def _codes(spark, rows):
    df = spark.createDataFrame(rows, "rs string, ic string, cc string")
    out = agg.dominant_collection_codes(df, "rs", "ic", "cc")
    return {
        r["rs"]: (r["institutioncode"], r["collectioncode"])
        for r in out.collect()
    }


def test_dominance_arms(spark):
    rows = []
    # g0: no ic at all -> '', '' (:79-81)
    rows += [("g0", None, None)] * 4
    # g1: single bucket at a LOW share (2 of 25) -> still chosen (the
    # `len(buckets) == 1 OR dominance` arm, :82-84); one cc bucket,
    # VERBATIM case
    rows += [("g1", "Solo (S)", "C1"), ("g1", "Solo (S)", None)]
    rows += [("g1", None, None)] * 23
    # g2: 24/25 > 0.9 -> chosen; two cc buckets -> MULTIPLE
    rows += [("g2", "Beta (B)", "x" if i % 2 else "y") for i in range(24)]
    rows += [("g2", "Other", None)]
    # g3: exactly 0.9 with two buckets -> STRICT > fails -> MULTIPLE
    rows += [("g3", "A", None)] * 9 + [("g3", "B", None)]
    # g4: denominator includes missing-ic docs: 9 vs 1 among non-null
    # (90%) but 15 NULL rows dilute to 0.36 -> MULTIPLE (:83 divides by
    # the recordset doc_count)
    rows += [("g4", "D (Q)", None)] * 9 + [("g4", "E", None)]
    rows += [("g4", None, None)] * 15
    # g5: count tie -> key asc wins (ES terms-agg default order)
    rows += [("g5", "zzz", None)] * 3 + [("g5", "aaa", None)] * 3
    got = _codes(spark, rows)
    assert got["g0"] == ("", "")
    assert got["g1"] == ("s", "C1")
    assert got["g2"] == ("b", "MULTIPLE")
    assert got["g3"] == ("MULTIPLE", "MULTIPLE")
    assert got["g4"] == ("MULTIPLE", "MULTIPLE")
    assert got["g5"] == ("MULTIPLE", "MULTIPLE")  # tie: 3 vs 3, 2 buckets


def test_dominance_tiebreak_and_cc_empty(spark):
    # dominant single-vs-single tie inside the chosen arm: two buckets,
    # equal counts -> 2/4 = 0.5, 2 buckets -> MULTIPLE; but with one
    # bucket strictly larger and > 0.9 overall the smaller key must NOT
    # win on key order
    rows = [("r", "bbb", None)] * 19 + [("r", "aaa", None)]
    got = _codes(spark, rows)
    assert got["r"] == ("bbb", "")  # 19/20 = 0.95; cc absent -> ''


def test_index_assembly_quirks():
    """generate_static_datasets_index.py:105-144 — grouping, routing,
    uuid gate, quote stripping, orphan-eml silence."""
    import datetime

    from idb_backend_spark.export.writers import datasets_index_rows

    rsid = "9a0d0f35-0000-4000-8000-000000000001"
    old = datetime.date(2026, 7, 1)
    fresh = datetime.date(2026, 8, 15)
    cutoff = datetime.date(2026, 8, 9)
    keys = [
        {"name": "index.txt", "last_modified": fresh},          # skipped
        {"name": f"{rsid}.zip", "last_modified": fresh, "etag": 'e"tag'},
        {"name": f"{rsid}.eml", "last_modified": fresh},
        {"name": "orphan.eml", "last_modified": fresh},          # no zip: silent
        {"name": "notauuid.zip", "last_modified": fresh, "etag": "x"},
        {"name": "stale.zip", "last_modified": old, "etag": "y"},  # cutoff
    ]
    rows = datasets_index_rows(
        keys, {rsid: ("am", "C1")}, cutoff_date=cutoff
    )
    assert rows[0][0] == "zipfile"
    body = {r[0]: r for r in rows[1:]}
    assert set(body) == {f"{rsid}.zip", "notauuid.zip"}
    rs_row = body[f"{rsid}.zip"]
    # quote stripped from the etag; eml grouped by first-dot key;
    # uuid-keyed zip carries recordset id + codes
    assert rs_row == [
        f"{rsid}.zip", f"{rsid}.eml", "etag", "2026-08-15",
        rsid, "am", "C1",
    ]
    # non-uuid fkey: no recordset fields
    assert body["notauuid.zip"][4:] == ["", "", ""]


def test_promotion_oracle_matches_spark(spark, sf_dir):
    """The DuckDB twin for datasets_index_codes stays row-identical to
    the Spark entry (promoted to a graded slot in round 11)."""
    import duckdb

    from idb_backend_spark.plans.catalog import Q
    from idb_backend_spark.plans.q_relational import _DATASETS_INDEX_ORACLE

    spark_rows = sorted(
        tuple(r) for r in Q["datasets_index_codes"](spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    oracle_rows = sorted(
        tuple(r) for r in con.execute(_DATASETS_INDEX_ORACLE).fetchall()
    )
    assert spark_rows == oracle_rows
