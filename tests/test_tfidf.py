"""TF-IDF top terms (operators/tfidf.py): hand-computed goldens, edge
docs, integer-deterministic ranking, and cross-engine parity against
the DuckDB twin (pre-flight for a future driver-gate slot — the queue
behind epoch_shuffle and bigram_lm_score)."""

import math

import duckdb

from idb_backend_spark.operators import tfidf


def _rows(df):
    return {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"], r["score"])
        for r in df.collect()
    }


def test_tfidf_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry apple"),
            (4, ""),      # phantom-token edge: absent
            (5, None),    # NULL text: absent
        ],
        "doc_id long, text string",
    )
    got = _rows(tfidf.tfidf_top_terms(docs, k=2))
    # N=3; df: apple 2, banana 2, cherry 2 — all idf = ln(3/2)
    idf = math.log(3 / 2)
    # doc 1: apple tf=2 ranks over banana tf=1
    assert got[(1, 1)] == ("apple", 2, 2, round(2 * idf, 6))
    assert got[(1, 2)] == ("banana", 1, 2, round(1 * idf, 6))
    # doc 2: tf tie, df tie -> term ASC breaks: banana before cherry
    assert got[(2, 1)][0] == "banana"
    assert got[(2, 2)][0] == "cherry"
    # doc 3: cherry tf=3 first; k=2 truncates after apple
    assert got[(3, 1)] == ("cherry", 3, 2, round(3 * idf, 6))
    assert got[(3, 2)][0] == "apple"
    assert {d for d, _ in got} == {1, 2, 3}


def test_tfidf_rank_prefers_rarer_term_on_tf_tie(spark):
    docs = spark.createDataFrame(
        [
            (1, "common rare"),
            (2, "common x"),
            (3, "common y"),
        ],
        "doc_id long, text string",
    )
    got = _rows(tfidf.tfidf_top_terms(docs, k=2))
    # doc 1: tf tie (1, 1); df(common)=3 > df(rare)=1 -> rare first
    assert got[(1, 1)][0] == "rare"
    assert got[(1, 2)][0] == "common"


def test_tfidf_stopword_never_outranks_salient_term(spark):
    """Ranking must be monotone in the shipped score: a ubiquitous
    term (df = N, score exactly 0.0) can carry the highest tf in a doc
    and still must rank BELOW any positive-score term — the
    integer-only (tf, df, term) triple got this wrong."""
    docs = spark.createDataFrame(
        [
            (1, "the the the zebra zebra"),
            (2, "the a"),
            (3, "the b"),
            (4, "the c"),
        ],
        "doc_id long, text string",
    )
    got = _rows(tfidf.tfidf_top_terms(docs, k=1))
    # doc 1: 'the' tf=3 df=4 score=0.0; 'zebra' tf=2 df=1 score=2ln4
    assert got[(1, 1)][0] == "zebra"
    ranked = tfidf.tfidf_top_terms(docs, k=10).collect()
    for r1 in ranked:
        for r2 in ranked:
            if r1["doc_id"] == r2["doc_id"] and r1["rank"] < r2["rank"]:
                assert r1["score"] >= r2["score"]


def test_tfidf_null_doc_id_excluded_both_engines(spark):
    """A NULL id must not inflate N on the Spark side while the twin's
    count(DISTINCT) skips it — both engines drop the unkeyed doc."""
    docs = spark.createDataFrame(
        [(1, "apple banana"), (2, "apple cherry"), (None, "banana cherry")],
        "doc_id long, text string",
    )
    got = _rows(tfidf.tfidf_top_terms(docs, k=5))
    assert {d for d, _ in got} == {1, 2}
    # N=2: apple df=2 -> score 0.0; banana/cherry df=1 -> ln(2)
    assert got[(1, 1)][0] == "banana"
    assert got[(1, 1)][3] == round(math.log(2), 6)

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(f"{td}/documents.parquet")
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{td}/documents.parquet/*.parquet'"
        )
        want = {
            (r[0], r[4]): (r[1], r[2], r[3], r[5])
            for r in con.sql(tfidf.tfidf_top_terms_sql(k=5)).fetchall()
        }
    assert set(got) == set(want)
    for k_ in got:
        assert got[k_][:3] == want[k_][:3]
        assert abs(got[k_][3] - want[k_][3]) <= 1.01e-6


def test_tfidf_matches_duckdb_twin(spark, sf_dir):
    """Top-5 per doc over the real documents table must equal the SQL
    twin row-for-row: ranking exactly (it never touches a float), score
    within one 6-dp rounding step (cross-libm ln)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _rows(tfidf.tfidf_top_terms(docs, k=5))

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {
        (r[0], r[4]): (r[1], r[2], r[3], r[5])
        for r in con.sql(tfidf.tfidf_top_terms_sql(k=5)).fetchall()
    }
    assert set(got) == set(want)
    mism = {
        k: (got[k], want[k])
        for k in got
        if got[k][:3] != want[k][:3]
        or abs(got[k][3] - want[k][3]) > 1.01e-6
    }
    assert not mism, list(mism.items())[:5]


def test_tfidf_plan_native_single_explode(spark, sf_dir):
    import contextlib
    import io
    import re

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = tfidf.tfidf_top_terms(docs)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    text = buf.getvalue()
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    # tf is checkpointed, so the final plan contains NO corpus explode
    # (it ran once at checkpoint time) — the scoring join and window
    # read the materialized tf
    assert len(re.findall(r"\(\d+\) Generate", text)) == 0
