"""Hashed Naive-Bayes quality classifier (operators/classifier.py):
Python-recomputed goldens (a third, independent implementation of the
hash + smoothing), NULL-label and phantom-token edges, cross-engine
parity against the DuckDB twin, separation sanity on the real corpus,
and the native-plan/broadcast contract — the pre-flight battery for a
future driver-gate slot (the queue documented in plans/catalog.py)."""

import hashlib
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from idb_backend_spark.operators import classifier


def _bucket(tok: str, d: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % d


def _py_nb(rows, d):
    """Independent NB replica: rows = [(id, text, y)] with y in
    {True, False, None}; returns {id: (n_tokens, score, pred)}."""
    import re

    def toks(t):
        return re.sub(r"\s+", " ", (t or "").lower()).strip().split(" ")

    c1, c0 = {}, {}
    n1 = n0 = 0
    for _id, text, y in rows:
        if y is None:
            continue
        if y:
            n1 += 1
        else:
            n0 += 1
        for t in toks(text):
            j = _bucket(t, d)
            (c1 if y else c0)[j] = (c1 if y else c0).get(j, 0) + 1
    tot1, tot0 = sum(c1.values()), sum(c0.values())
    v = len(set(c1) | set(c0))  # occupied buckets — the smoothing vocab
    out = {}
    for _id, text, _y in rows:
        s = math.log(n1 / n0)
        tk = toks(text)
        for t in tk:
            j = _bucket(t, d)
            s += math.log((c1.get(j, 0) + 1) / (tot1 + v)) - math.log(
                (c0.get(j, 0) + 1) / (tot0 + v)
            )
        out[_id] = (len(tk), round(s, 6), s > 0)
    return out


ROWS = [
    (1, "good clean prose text", True),
    (2, "good text prose", True),
    (3, "spam spam buy now", False),
    (4, "buy spam now now", False),
    (5, "good prose or spam", None),  # unlabeled: scored, not trained on
    (6, "", True),  # phantom token '' — scored, trains the '' bucket
    (7, None, None),  # NULL text: tokenizes like '' on both engines
]


def test_nb_golden_vs_python_replica(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string, y boolean")
    got = {
        r["doc_id"]: (r["n_tokens"], r["score"], r["pred"])
        for r in classifier.nb_quality_score(
            docs, F.col("y"), n_buckets=64
        ).collect()
    }
    want = _py_nb(ROWS, 64)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) <= 1.01e-6, (k, got[k], want[k])
        assert got[k][2] == want[k][2], k


def test_nb_separates_the_training_classes(spark):
    docs = spark.createDataFrame(
        [r for r in ROWS if r[2] is not None],
        "doc_id long, text string, y boolean",
    )
    got = {
        r["doc_id"]: r["pred"]
        for r in classifier.nb_quality_score(
            docs, F.col("y"), n_buckets=64
        ).collect()
    }
    # train-on-self must at least separate its own training classes
    assert got[1] and got[2] and not got[3] and not got[4]


def test_nb_single_class_raises(spark):
    docs = spark.createDataFrame(
        [(1, "a", True), (2, "b", True)], "doc_id long, text string, y boolean"
    )
    with pytest.raises(ValueError, match="per class"):
        classifier.nb_hash_model(docs, F.col("y"))


def test_nb_matches_duckdb_twin(spark, sf_dir):
    """lang=='en' train-on-self over the real documents table must equal
    the SQL twin row-for-row: integer columns and pred exactly, score
    within one 6-dp rounding step (cross-libm ln + shuffle-order sums —
    same tolerance contract as the LM twin test)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_tokens"], r["score"], r["pred"])
        for r in classifier.nb_quality_score(
            docs, F.col("lang") == "en"
        ).collect()
    }

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(
            classifier.nb_quality_score_sql("lang = 'en'")
        ).fetchall()
    }
    assert set(got) == set(want)
    mism = {
        k: (got[k], want[k])
        for k in got
        if got[k][0] != want[k][0]
        or abs(got[k][1] - want[k][1]) > 1.01e-6
        or got[k][2] != want[k][2]
    }
    assert not mism, list(mism.items())[:5]


def test_nb_learns_a_text_derived_label(spark, sf_dir):
    """Separation sanity on the real corpus with a label the text CAN
    carry: y = text contains 'spark'. (The synthetic lang column is
    deliberately uninformative — every language shares one vocabulary —
    so lang-based self-accuracy would test the data, not the model.)
    Train-on-self must recover the rule almost perfectly: the 'spark'
    bucket gets an extreme likelihood ratio."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    y = F.col("text").contains("spark")
    got = {
        r["doc_id"]: r["pred"]
        for r in classifier.nb_quality_score(docs, y).collect()
    }
    truth = {
        r["doc_id"]: r["y"]
        for r in docs.select("doc_id", y.alias("y")).collect()
    }
    acc = sum(1 for k in got if got[k] == truth[k]) / len(got)
    assert acc > 0.9, acc


def test_nb_plan_native_and_broadcast(spark, sf_dir):
    import contextlib
    import io
    import re

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = classifier.nb_quality_score(docs, F.col("lang") == "en")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    text = buf.getvalue()
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    # model lookup must be broadcast (bounded by n_buckets), never a
    # corpus shuffle
    assert "BroadcastHashJoin" in text
    # the checkpointed model feeds totals + the score join, so the final
    # plan re-explodes the corpus exactly once (the score stream)
    assert len(re.findall(r"\(\d+\) Generate", text)) == 1
