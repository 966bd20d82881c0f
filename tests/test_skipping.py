"""Fulltext data-skipping index tests: pruning correctness (no false
negatives, fewer files read) and end-to-end result equality with the
unpruned scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from idb_backend_spark.functions.text import fulltext_column
from idb_backend_spark.plans import skipping


def _table(spark, tmp_path):
    # 8 files; the token 'zebra' appears in exactly one partition's rows
    rows = []
    for i in range(400):
        word = "zebra" if i % 400 == 7 else f"word{i % 40}"
        rows.append((i, f"common text {word} here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.repartition(8, "doc_id").withColumn(
        "fulltext", fulltext_column("text")
    )
    path = str(tmp_path / "docs")
    df.write.mode("overwrite").parquet(path)
    return path


def test_prune_and_scan(spark, tmp_path):
    path = _table(spark, tmp_path)
    idx = str(tmp_path / "docs_tokidx")
    base = spark.read.parquet(path)
    skipping.build_token_index(base, ["fulltext"], idx)

    all_files = skipping.prune_files(spark, idx, [])
    assert len(all_files) == 8

    # 'zebra' lives in one row -> at most a couple of files admit it
    zfiles = skipping.prune_files(spark, idx, ["zebra"])
    assert 1 <= len(zfiles) < 8

    # conjunction tightens: common token alone admits everything
    cfiles = skipping.prune_files(spark, idx, ["common"])
    assert len(cfiles) == 8
    both = skipping.prune_files(spark, idx, ["common", "zebra"])
    assert set(both) == set(zfiles)

    # pruned scan == full scan, for hit and miss queries
    for q in ["zebra here", "common text", "nosuchtoken"]:
        got = sorted(
            r["doc_id"]
            for r in skipping.fulltext_scan(spark, path, idx, q).collect()
        )
        expect = sorted(
            r["doc_id"]
            for r in base.filter(
                F.col("fulltext").contains(q.split()[0])
                & F.col("fulltext").contains(q.split()[-1])
            ).collect()
        )
        assert got == expect, q


def test_missing_token_skips_all_files(spark, tmp_path):
    path = _table(spark, tmp_path)
    idx = str(tmp_path / "docs_tokidx2")
    skipping.build_token_index(spark.read.parquet(path), ["fulltext"], idx)
    assert skipping.prune_files(spark, idx, ["qqqqq"]) == []
    out = skipping.fulltext_scan(spark, path, idx, "qqqqq")
    assert out.count() == 0
