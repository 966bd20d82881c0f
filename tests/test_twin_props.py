"""Hypothesis sweeps over the newest engine/twin pairs — the same
technique whose fulltext sweep (tests/test_fulltext_prop.py) caught the
Java-vs-DuckDB Unicode lowercase divergence ('İ0'). Each test executes
BOTH engines over generated inputs and asserts row-for-row equality, so
a tokenizer/slicing/null-semantics drift in either rendering fails
loudly instead of waiting for matching data."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from idb_backend_spark.operators import dedup, sketches
from idb_backend_spark.operators import neardup_index as ni

# the fulltext sweep's adversarial alphabet: case traps (Turkish I,
# final sigma, titlecase digraph), combining marks, CJK, punctuation,
# whitespace variants — everything the fold/normalizer must agree on
_ALPHABET = (
    "abzAZ019_ .,;:!?'\"-"
    "éüñß́̇"
    "ΣΑΣ"
    "Iİı"
    "ǅſK"
    "漢字"
    "\t\n  "
)

_texts = st.lists(
    st.one_of(st.none(), st.text(alphabet=_ALPHABET, max_size=30)),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_texts)
def test_remove_repeated_spans_twin_property(spark, texts):
    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in dedup.remove_repeated_spans(df, "text", "doc_id", 3).collect()
    }
    con = duckdb.connect()
    con.register("docs_tbl", pd.DataFrame(docs, columns=["doc_id", "text"]))
    want = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            dedup.remove_repeated_spans_sql("docs_tbl", "text", "doc_id", 3)
        ).fetchall()
    }
    assert got == want, texts


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.one_of(
            st.none(), st.sampled_from(["a", "b", "İ", "ς", "k", "K"])
        ),
        min_size=1,
        max_size=60,
    )
)
def test_cms_heavy_hitters_twin_property(spark, keys):
    """Forced-narrow width (4) so collisions are common: the exact
    re-count must still reproduce plain GROUP BY ... HAVING for every
    generated key multiset, including NULLs and case-trap strings
    (keys are NOT normalized — 'İ' and 'K' stay distinct keys; only
    the hash must agree with itself)."""
    rows = [(k,) for k in keys]
    # NULL-safe sort key: a result set mixing the NULL group with
    # string keys is expected and must still be comparable
    key_fn = lambda t: (t[0] is None, t[0] or "", t[1])  # noqa: E731
    df = spark.createDataFrame(rows, "key string")
    got = sorted(
        (
            (r["key"], r["n"])
            for r in sketches.cms_heavy_hitters(
                df, "key", 3, depth=2, width=4
            ).collect()
        ),
        key=key_fn,
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["key"]))
    want = sorted(
        (
            (r[0], r[1])
            for r in con.sql(
                sketches.heavy_hitters_sql("t", "key", 3)
            ).fetchall()
        ),
        key=key_fn,
    )
    assert got == want, keys


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_texts, _texts)
def test_neardup_exact_probe_twin_property(spark, tmp_path_factory, corpus_texts, batch_texts):
    """build + exact-verified probe vs the cross-pair twin over
    generated unicode corpora (threshold 0.3 so tiny texts can pair)."""
    corpus = [(i, t) for i, t in enumerate(corpus_texts)]
    batch = [(1000 + i, t) for i, t in enumerate(batch_texts)]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(batch, "doc_id long, text string")
    idx = str(tmp_path_factory.mktemp("ndprop") / "idx")
    ni.build_neardup_index(cdf, "text", "doc_id", idx)
    got = sorted(
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in ni.probe_neardup_index(
            bdf,
            "text",
            "doc_id",
            idx,
            threshold=0.3,
            verify="exact",
            corpus=cdf,
        ).collect()
    )
    con = duckdb.connect()
    con.register(
        "t", pd.DataFrame(corpus + batch, columns=["doc_id", "text"])
    )
    want = sorted(
        (r[0], r[1], r[2])
        for r in con.sql(
            ni.probe_neardup_exact_sql(
                "t", "text", "doc_id",
                "doc_id >= 1000", "doc_id < 1000", 3, 0.3,
            )
        ).fetchall()
    )
    assert got == want, (corpus_texts, batch_texts)
