"""TF-IDF top terms per document — the keyword-extraction stage.

Corpus pipelines use per-document salient terms for topic filtering,
near-duplicate triage, and index enrichment (the reference exposes raw
term statistics through its uniquevals/fulltext surfaces — this is the
per-document inversion of the same statistic, reference
idb/indexing/index.py term-vector usage). Spark-first shape:

  * ``term_stats`` — ONE explode of the tokenized corpus is the only
    row multiplier; tf is a hash aggregate on (doc, term); df is
    derived FROM tf (tf rows are already distinct (doc, term) pairs,
    so df = per-term row count of tf — the corpus is scanned once, not
    twice), with map-side partial combine on both.
  * ``tfidf_top_terms`` — tf ⨝ df on term (AQE broadcasts df when it
    fits — it is |vocabulary|-sized, not corpus-sized), then one
    window per doc for the top-k.

Ranking is by the 6-dp-ROUNDED score descending, with the integer
triple (tf DESC, df ASC, term ASC) breaking ties. Rounding first keeps
the order monotone in the score column the rows ship (a ubiquitous
df=N stopword scores 0.0 and must NOT outrank a rare term — an
integer-only triple got that wrong), while the integer tie-break keeps
mathematically tied scores engine-independent: distinct (tf, df) pairs
CAN tie exactly (tf=2 against df=N/16 scores ln(256), as does tf=8
against df=N/2) and the two engines' libm `ln` could order such pairs
differently in the last ulp — after rounding they are equal on both
sides and the integers decide. The residual risk is the repo's
standard rounding-boundary caveat: a score within ~1 ulp of a .5e-6
boundary can round apart cross-libm and shift row membership at the
k boundary (same class as bigram_lm_score's avg_logp).

N (the document count) counts docs with >= 1 token, derived from the
stats themselves — a bounded one-value collect, same contract as
bigram_model's vocabulary size (operators/lm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from idb_backend_spark.functions.text import NORM_SQL, TOKS_SQL, tokens


def term_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, int]:
    """(tf, df, n_docs): per-(doc, term) counts, per-term document
    frequency, and the scoring-universe size. The phantom token of
    empty/whitespace text (split('', ' ') -> ['']) is filtered, so
    empty and NULL docs are absent — they have no terms to rank. NULL
    ids are excluded up front: an unkeyed document cannot be referenced
    by its top terms, and the SQL twin's count(DISTINCT id) would skip
    it from N anyway — filtering both sides keeps the engines on one
    universe."""
    terms = (
        docs.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
    )
    # tf is reused THREE times (df aggregate, the scoring join, the
    # n_docs count): localCheckpoint materializes it once so the
    # corpus explode runs once, not three times (pattern:
    # lm.bigram_model's c_ab, dedup's minhash sketch reuse)
    tf = (
        terms.groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    # tf rows are distinct (doc, term): per-term df is a row count of
    # tf, not a second distinct-aggregate over the exploded stream
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    # n_docs is a bounded one-value collect like bigram_model's V
    n_docs = tf.select(id_col).distinct().count()
    return tf, df, n_docs


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-k salient terms per document: (id, term, tf, df, rank,
    score) with score = tf * ln(n_docs / df) rounded to 6 dp and rank
    by (score DESC, tf DESC, df ASC, term ASC) — see the module
    docstring for why the score is rounded BEFORE ranking."""
    tf, df, n_docs = term_stats(docs, text_col, id_col)
    joined = tf.join(df, "term").withColumn(
        "score",
        F.round(
            F.col("tf")
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
            6,
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(),
        F.col("tf").desc(),
        F.col("df").asc(),
        F.col("term").asc(),
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            F.col("rank").cast("bigint").alias("rank"),
            "score",
        )
    )


def tfidf_top_terms_sql(k: int = 5) -> str:
    """DuckDB twin of ``tfidf_top_terms`` over the ``documents`` table —
    kept HERE so the ranking rule and the score formula live in one
    place (pattern: lm.bigram_lm_score_sql). The rounded-score ranking
    shares the standard cross-libm rounding-boundary caveat (module
    docstring); exact mathematical ties are decided by the integer
    tie-break identically on both engines. NULL doc_ids are excluded
    like the engine side."""
    return (
        "WITH t AS (SELECT doc_id, "
        f"  CASE WHEN {NORM_SQL} = '' THEN [] ELSE {TOKS_SQL} END AS tk "
        "  FROM documents WHERE doc_id IS NOT NULL), "
        "u AS (SELECT doc_id, unnest(tk) AS term FROM t), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM u "
        "  GROUP BY doc_id, term), "
        "dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        "n AS (SELECT count(DISTINCT doc_id) AS n FROM tf), "
        "sc AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df, "
        "  round(tf.tf * ln(n.n / CAST(dfq.df AS DOUBLE)), 6) AS score "
        "  FROM tf JOIN dfq USING (term) CROSS JOIN n), "
        "s AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY "
        "    score DESC, tf DESC, df ASC, term ASC) AS rnk FROM sc) "
        "SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, "
        f"CAST(df AS BIGINT) AS df, CAST(rnk AS BIGINT) AS rank, score "
        f"FROM s WHERE rnk <= {int(k)} ORDER BY doc_id, rank"
    )
