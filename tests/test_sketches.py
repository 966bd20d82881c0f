"""Sketch audits (operators/sketches.py): the HLL++ cardinality and
GK-quantile audits must certify Spark's sketches against exact
aggregates on real tables (within-bound booleans all TRUE), and the
exact columns must match the DuckDB twins — pre-flight for future
driver-gate slots alongside tfidf/bigram_lm in the grading queue."""

import duckdb
import pytest

from idb_backend_spark.operators import sketches


def test_hll_audit_within_bound_real_table(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = sketches.hll_distinct_audit(
        li, "l_returnflag", "l_orderkey"
    ).collect()
    assert len(out) > 0
    assert all(r["within_tol"] for r in out)


def test_hll_audit_matches_duckdb_twin(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        r["l_returnflag"]: (r["exact_distinct"], r["within_tol"])
        for r in sketches.hll_distinct_audit(
            li, "l_returnflag", "l_partkey"
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            sketches.hll_distinct_audit_sql(
                "lineitem", "l_returnflag", "l_partkey"
            )
        ).fetchall()
    }
    assert got == want


def test_hll_audit_small_group_exact(spark):
    # tiny cardinalities: HLL++ linear-counting region is exact, the
    # boolean must not flake
    df = spark.createDataFrame(
        [(g, v) for g in ("a", "b") for v in range(20)], "g string, v long"
    )
    out = sketches.hll_distinct_audit(df, "g", "v").collect()
    assert {(r["g"], r["exact_distinct"], r["within_tol"]) for r in out} == {
        ("a", 20, True),
        ("b", 20, True),
    }


_PROBS = [0.5, 0.9, 0.99]


def test_quantile_audit_within_bound_real_table(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = sketches.quantile_audit(li, "l_extendedprice", _PROBS).collect()
    assert [r["p"] for r in sorted(out, key=lambda r: r["p"])] == _PROBS
    assert all(r["within_tol"] for r in out)


def test_quantile_audit_matches_duckdb_twin(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        r["p"]: (r["exact_q"], r["within_tol"])
        for r in sketches.quantile_audit(
            li, "l_extendedprice", _PROBS
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            sketches.quantile_audit_sql("lineitem", "l_extendedprice", _PROBS)
        ).fetchall()
    }
    assert set(got) == set(want)
    for p in got:
        assert got[p][1] == want[p][1]
        assert got[p][0] == pytest.approx(want[p][0], abs=1.01e-6), p


def test_quantile_audit_empty_and_all_null_zero_rows(spark):
    """Nothing to audit -> NO rows, on BOTH engines (the twin filters
    the NULL quantile list before unnesting; DuckDB would otherwise
    zip-pad one (p, NULL, TRUE) row per prob)."""
    empty = spark.createDataFrame([], "x double")
    assert sketches.quantile_audit(empty, "x", _PROBS).collect() == []
    nulls = spark.createDataFrame([(None,), (None,)], "x double")
    assert sketches.quantile_audit(nulls, "x", _PROBS).collect() == []

    con = duckdb.connect()
    con.sql("CREATE TABLE t (x DOUBLE)")
    sql = sketches.quantile_audit_sql("t", "x", _PROBS)
    assert con.sql(sql).fetchall() == []
    con.sql("INSERT INTO t VALUES (NULL), (NULL)")
    assert con.sql(sql).fetchall() == []


def test_quantile_audit_golden(spark):
    df = spark.createDataFrame([(float(i),) for i in range(101)], "x double")
    out = {
        r["p"]: (r["exact_q"], r["within_tol"])
        for r in sketches.quantile_audit(df, "x", [0.5, 0.9]).collect()
    }
    assert out[0.5] == (50.0, True)
    assert out[0.9] == (90.0, True)


def test_audits_single_aggregate_plan(spark, sf_dir):
    """Both measures must ride ONE exchange — the audit's cost story."""
    import contextlib
    import io
    import re

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = sketches.hll_distinct_audit(li, "l_returnflag", "l_orderkey")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    text = buf.getvalue()
    # countDistinct expands to a two-level aggregate (distinct on
    # (group, value) then count), with the HLL sketch merged through
    # both levels — 2 exchange NODES max (formatted explain repeats
    # each node name in its detail section), no join, no python
    assert len(re.findall(r"\(\d+\) Exchange", text)) <= 2
    assert "Join" not in text
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text


def test_cms_heavy_hitters_equals_exact_having(spark):
    """The CMS prefilter is a physical rewrite: output == plain
    GROUP BY ... HAVING, row for row, on a skewed key column."""
    import duckdb
    import pandas as pd

    from idb_backend_spark.operators import sketches as sk

    # zipf-ish skew: key k appears ~ 600/k times, plus a NULL group
    rows = [(f"host{k}",) for k in range(1, 40) for _ in range(600 // k)]
    rows += [(None,)] * 25
    df = spark.createDataFrame(rows, "domain string")
    got = sorted(
        (r["domain"], r["n"])
        for r in sk.cms_heavy_hitters(df, "domain", 50).collect()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["domain"]))
    want = sorted(
        (r[0], r[1])
        for r in con.sql(sk.heavy_hitters_sql("t", "domain", 50)).fetchall()
    )
    assert got == want
    assert len(got) > 3  # the skew genuinely produces heavy hitters


def test_cms_zero_false_negatives_under_forced_collisions(spark):
    """width=2 forces nearly every key into colliding buckets — the
    estimate over-counts wildly, but over-counting can only ADD false
    candidates (removed by the exact re-count), never drop a true heavy
    hitter: output must still equal exact HAVING."""
    import duckdb
    import pandas as pd

    from idb_backend_spark.operators import sketches as sk

    rows = [(f"k{i % 7}",) for i in range(200)]
    df = spark.createDataFrame(rows, "key string")
    got = sorted(
        (r["key"], r["n"])
        for r in sk.cms_heavy_hitters(
            df, "key", 29, depth=2, width=2
        ).collect()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["key"]))
    want = sorted(
        (r[0], r[1])
        for r in con.sql(sk.heavy_hitters_sql("t", "key", 29)).fetchall()
    )
    assert got == want


def test_cms_plan_is_broadcast_and_native(spark):
    import contextlib
    import io

    from pyspark.sql import functions as F

    from idb_backend_spark.operators import sketches as sk

    df = spark.range(1000).select(
        (F.col("id") % 13).cast("string").alias("key")
    )
    hh = sk.cms_heavy_hitters(df, "key", 50, depth=3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hh.explain(mode="formatted")
    import re

    text = buf.getvalue()
    # one broadcast join per depth row, nothing sort-merge/shuffled
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", text)) == 3
    assert "SortMergeJoin" not in text and "CartesianProduct" not in text
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text


def test_cms_validation(spark):
    import pytest as _pytest

    from idb_backend_spark.operators import sketches as sk

    df = spark.createDataFrame([("a",)], "key string")
    with _pytest.raises(ValueError, match="depth/width"):
        sk.cms_counters(df, "key", depth=0)
    with _pytest.raises(ValueError, match="threshold"):
        sk.cms_heavy_hitters(df, "key", 0)


def test_cms_depth_one_works(spark):
    """depth=1 is a valid (single hash row) configuration — the least()
    fold must not demand two columns."""
    import duckdb
    import pandas as pd

    from idb_backend_spark.operators import sketches as sk

    rows = [(f"k{i % 5}",) for i in range(100)]
    df = spark.createDataFrame(rows, "key string")
    got = sorted(
        (r["key"], r["n"])
        for r in sk.cms_heavy_hitters(df, "key", 20, depth=1).collect()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["key"]))
    want = sorted(
        (r[0], r[1])
        for r in con.sql(sk.heavy_hitters_sql("t", "key", 20)).fetchall()
    )
    assert got == want
