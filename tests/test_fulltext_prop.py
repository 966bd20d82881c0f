"""P7/§4 fulltext contract: query-side and document-side tokenization
must be the SAME function, or whole-token matching and token-index
pruning silently diverge (SURVEY §7.7).

`analyzer_tokens` (Spark: lower + regexp_extract_all `[\\p{L}\\p{N}_]+`)
and `analyzer_tokenize` (Python: str.lower + `\\w+`) are twins by
construction; these tests enforce the twin-ship over generated unicode —
including the case-mapping traps (final sigma, Turkish dotted I, titlecase
digraphs) where Java and Python lowercasing could plausibly drift — and
pin the documented apostrophe divergence vs ES ("don't" -> don,t).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from idb_backend_spark.functions.text import analyzer_tokenize

# adversarial alphabet: ASCII word/punct, apostrophes (ASCII + typographic),
# accents, combining marks, Greek capitals (final-sigma context rule),
# Turkish dotted/dotless I, titlecase digraph, long s, Kelvin sign,
# fullwidth digits, CJK, RTL, emoji, underscore and whitespace variants
_ALPHABET = (
    "abzAZ019_ .,;:!?'’\"-/\\()"
    "éüñçß́̇"
    "ΣΟΦΑΘΩΑΣ"
    "Iİı"
    "ǅǄǆ"
    "ſK"
    "０９"
    "漢字かなカナ"
    "شمس"
    "🦜"
    "\t\n  "
)


def _spark_tokens(spark, texts):
    from pyspark.sql import functions as F  # noqa: F401

    from idb_backend_spark.functions.text import analyzer_tokens

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, s string")
    rows = df.select("i", analyzer_tokens("s").alias("t")).collect()
    return {r["i"]: r["t"] for r in rows}


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet=_ALPHABET, max_size=40),
        min_size=1,
        max_size=60,
    )
)
def test_query_and_document_tokenizers_agree(spark, texts):
    got = _spark_tokens(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == analyzer_tokenize(t), repr(t)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=60))
def test_tokenizers_agree_on_arbitrary_unicode(spark, texts):
    """Same contract over hypothesis's full (surrogate-free) unicode
    space, not just the curated alphabet."""
    got = _spark_tokens(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == analyzer_tokenize(t), repr(t)


def test_apostrophe_divergence_is_pinned(spark):
    """The documented ES divergence (SURVEY §7.7): mid-word apostrophes
    split here ("don't" -> don,t) where ES's standard analyzer keeps one
    token. Pinned on BOTH sides so a 'fix' to either twin alone — which
    would break query/document agreement — fails loudly."""
    assert analyzer_tokenize("don't") == ["don", "t"]
    assert analyzer_tokenize("O'Brien's 2nd_visit") == [
        "o", "brien", "s", "2nd_visit",
    ]
    got = _spark_tokens(spark, ["don't", "O'Brien's 2nd_visit"])
    assert got[0] == ["don", "t"]
    assert got[1] == ["o", "brien", "s", "2nd_visit"]


def test_sql_twin_matches_spark_predicate_cross_engine(spark):
    """whole_token_match (Spark) and whole_token_match_sql (DuckDB) are
    twins by construction — prove it by EXECUTION on both engines over a
    generated corpus: the matching doc_id sets must be identical for
    every query, including punctuation-glued, apostrophe, unicode, and
    no-token queries."""
    import duckdb

    from idb_backend_spark.functions.text import (
        whole_token_match,
        whole_token_match_sql,
    )

    docs = [
        (1, "Apache Spark window merge functions"),
        (2, "spark, window; merge!"),
        (3, "sparkling windows merged"),        # whole-token must NOT match
        (4, "don't merge the spark window"),
        (5, "çava SPARK Window MERGE 漢字"),
        (6, None),
        (7, ""),
        (8, "o'brien's spark window merge"),
    ]
    queries = [
        "spark window merge",
        "don't",
        "SPARK,window",
        "çava",
        "漢字",
        "o'brien",
        "",
        "...",
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    con = duckdb.connect()
    con.register("docs_tbl", __import__("pandas").DataFrame(
        docs, columns=["doc_id", "text"]
    ))
    for q in queries:
        spark_ids = {
            r["doc_id"]
            for r in df.filter(whole_token_match("text", q)).collect()
        }
        sql = (
            "SELECT doc_id FROM docs_tbl WHERE text IS NOT NULL AND "
            + whole_token_match_sql("text", q)
        )
        duck_ids = {r[0] for r in con.sql(sql).fetchall()}
        # Spark's regexp on NULL text yields null -> filtered; mirror it
        spark_ids_nonnull = {
            i for i in spark_ids if docs[i - 1][1] is not None
        }
        assert spark_ids_nonnull == duck_ids, (q, spark_ids, duck_ids)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.text(alphabet=_ALPHABET, max_size=40), min_size=1,
             max_size=40),
    st.lists(st.text(alphabet=_ALPHABET, max_size=12), min_size=1,
             max_size=4),
)
def test_sql_twin_property_cross_engine(spark, texts, queries):
    """Close the three-engine triangle over GENERATED unicode: Spark's
    Java-regex predicate, the DuckDB RE2 twin, and (transitively, via
    test_query_and_document_tokenizers_agree) Python's \\w tokenizer
    must all pick the same documents for the same query."""
    import duckdb
    import pandas as _pd

    from idb_backend_spark.functions.text import (
        whole_token_match,
        whole_token_match_sql,
    )

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    con = duckdb.connect()
    con.register(
        "docs_tbl", _pd.DataFrame(docs, columns=["doc_id", "text"])
    )
    for q in queries:
        spark_ids = {
            r["doc_id"]
            for r in df.filter(whole_token_match("text", q)).collect()
        }
        duck_ids = {
            r[0]
            for r in con.sql(
                "SELECT doc_id FROM docs_tbl WHERE "
                + whole_token_match_sql("text", q)
            ).fetchall()
        }
        assert spark_ids == duck_ids, (q, spark_ids ^ duck_ids)
