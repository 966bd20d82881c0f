"""Bigram-LM quality scoring (operators/lm.py): hand-computed goldens,
add-one smoothing on unseen bigrams/contexts, short-doc edge cases, and
cross-engine parity against the DuckDB twin (the pre-flight for a future
driver-gate slot — the queue behind epoch_shuffle)."""

import math

import duckdb

from idb_backend_spark.operators import lm


def _score_map(df):
    return {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"]) for r in df.collect()
    }


def test_bigram_lm_score_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a"),   # bigrams (a,b), (b,a)
            (2, "a b"),     # bigram (a,b)
            (3, "x"),       # 1 token: no bigrams, absent from output
            (4, ""),        # phantom-token edge: absent
            (5, "   "),     # whitespace-only: absent
            (6, None),      # NULL text: absent
        ],
        "doc_id long, text string",
    )
    got = _score_map(lm.bigram_lm_score(docs))
    # model: c(a,b)=2, c(b,a)=1; contexts c(a)=2, c(b)=1; V={a,b}=2
    # ('x' never enters a bigram, so it is outside the vocabulary)
    p_ab = math.log((2 + 1) / (2 + 2))
    p_ba = math.log((1 + 1) / (1 + 2))
    assert set(got) == {1, 2}
    assert got[1] == (2, round((p_ab + p_ba) / 2, 6))
    assert got[2] == (1, round(p_ab, 6))


def test_bigram_smoothing_unseen(spark):
    train = spark.createDataFrame(
        [(1, "a b"), (2, "b c")], "doc_id long, text string"
    )
    cab, ca, v = lm.bigram_model(train)
    assert v == 3  # {a, b, c}
    cand = spark.createDataFrame(
        [
            (10, "a c"),  # unseen bigram, seen context a: (0+1)/(c_a=1 + 3)
            (11, "z z"),  # unseen context: (0+1)/(0 + 3) = uniform 1/V
        ],
        "doc_id long, text string",
    )
    got = _score_map(lm.bigram_logprob_score(cand, cab, ca, v))
    assert got[10] == (1, round(math.log(1 / 4), 6))
    assert got[11] == (1, round(math.log(1 / 3), 6))


def test_bigram_lm_matches_duckdb_twin(spark, sf_dir):
    """Train-on-self score over the real documents table must equal the
    SQL twin row-for-row: n_bigrams exactly (integer counts), avg_logp
    within one 6-dp rounding step — ln is cross-libm (last-ulp) and
    F.avg merges double partials in shuffle-arrival order, so a value
    landing within ~1 ulp of a .5e-6 boundary can legitimately round
    apart; demanding bit-exact equality here would be a latent flake."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _score_map(lm.bigram_lm_score(docs))

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.sql(lm.bigram_lm_score_sql()).fetchall()
    }
    assert set(got) == set(want)
    mism = {
        k: (got[k], want[k])
        for k in got
        if got[k][0] != want[k][0]
        or abs(got[k][1] - want[k][1]) > 1.01e-6
    }
    assert not mism, list(mism.items())[:5]


def test_bigram_lm_plan_native(spark, sf_dir):
    import contextlib
    import io

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = lm.bigram_lm_score(docs)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    text = buf.getvalue()
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    # the checkpointed model feeds c_a / V / the score join, so the
    # final plan re-explodes the corpus exactly once (the score stream);
    # the train pass ran once at checkpoint time. Count node HEADERS —
    # formatted explain repeats the node name in its detail section.
    import re

    assert len(re.findall(r"\(\d+\) Generate", text)) == 1
