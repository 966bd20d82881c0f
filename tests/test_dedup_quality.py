"""Near-dup estimator quality: MinHash estimates vs exact Jaccard,
LSH recall at threshold, SimHash Hamming behavior on perturbed docs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

import pytest

from idb_backend_spark.operators import ann, dedup


def _corpus(spark, n_docs=40, vocab=400, doc_len=120, dup_every=4, seed=11):
    """Synthetic docs where every dup_every-th doc is a light perturbation
    of its predecessor (high Jaccard); others are independent (low)."""
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    docs = []
    prev = None
    for i in range(n_docs):
        if prev is not None and i % dup_every == 1:
            toks = list(prev)
            for _ in range(max(1, doc_len // 20)):  # ~5% token swaps
                toks[rng.randrange(doc_len)] = rng.choice(words)
        else:
            toks = [rng.choice(words) for _ in range(doc_len)]
        docs.append((i, " ".join(toks)))
        prev = toks
    return spark.createDataFrame(docs, "doc_id long, text string")


def _exact_jaccard(spark, df, k=3):
    return {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, "text", "doc_id", k=k, threshold=0.0
        ).collect()
    }


def test_minhash_estimates_track_exact_jaccard(spark):
    df = _corpus(spark)
    exact = _exact_jaccard(spark, df)
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(
            df, "text", "doc_id", shingle_k=3, num_hashes=64, bands=16,
            threshold=0.0,
        ).collect()
    }
    # every high-sim pair must be found, with estimate near truth
    # (64 hashes -> se ~ sqrt(j(1-j)/64) <= 0.0625; allow 4 se)
    high = {p: j for p, j in exact.items() if j >= 0.6}
    assert high, "corpus must contain near-dup pairs"
    for pair, j in high.items():
        assert pair in est, f"LSH missed high-similarity pair {pair} (j={j})"
        assert abs(est[pair] - j) <= 0.25, (pair, est[pair], j)


def test_lsh_threshold_recall_and_precision(spark):
    df = _corpus(spark)
    exact = _exact_jaccard(spark, df)
    found = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            df, "text", "doc_id", shingle_k=3, num_hashes=64, bands=16,
            threshold=0.5,
        ).collect()
    }
    should_find = {p for p, j in exact.items() if j >= 0.7}
    must_not_find = {p for p, j in exact.items() if j <= 0.2}
    assert should_find <= found  # full recall well above threshold
    assert not (found & must_not_find)  # no gross false positives


def test_simhash_separates_perturbed_from_independent(spark):
    df = _corpus(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs(
            df, "text", "doc_id", max_hamming=6
        ).collect()
    }
    exact = _exact_jaccard(spark, df)
    for p in pairs:
        # anything within Hamming 6 must be genuinely similar
        assert exact.get(p, 0.0) >= 0.3, (p, pairs[p], exact.get(p))


def _vec_corpus(spark, n=120, dim=16, dup_every=4, noise=0.08, seed=5):
    """Unit-ish random vectors; every dup_every-th vector is a small
    perturbation of its predecessor (cosine well above 0.9)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = []
    prev = None
    for i in range(n):
        if prev is not None and i % dup_every == 1:
            v = prev + noise * rng.standard_normal(dim)
        else:
            v = rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v]))
        prev = v
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _brute_pairs(spark, df, threshold):
    from idb_backend_spark.functions.similarity import cosine_similarity

    a = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return {
        (r["id_a"], r["id_b"]): r["c"]
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            cosine_similarity(F.col("va"), F.col("vb")).alias("c"),
        )
        .filter(F.col("c") >= threshold)
        .collect()
    }


def test_banded_embedding_lsh_full_recall_at_high_threshold(spark):
    df = _vec_corpus(spark)
    exact = _brute_pairs(spark, df, 0.9)
    assert exact, "corpus must contain near-dup vector pairs"
    found = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dup_pairs(
            df, "embedding", "vec_id", threshold=0.9, n_bands=16, band_bits=4
        ).collect()
    }
    assert set(exact) <= found  # banded AND-OR recalls every true pair
    # and precision: exact cosine verify means no pair below threshold
    assert found <= set(_brute_pairs(spark, df, 0.9 - 1e-9))


def test_banded_embedding_lsh_join_is_bucketed(spark):
    """The candidate join must key on (band, bucket) — never a cross
    product — and the per-band bucket count must scale with band_bits."""
    import contextlib
    import io

    df = _vec_corpus(spark, n=40)
    out = dedup.embedding_near_dup_pairs(
        df, "embedding", "vec_id", threshold=0.9, n_bands=4, band_bits=3
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_exact_verified_equals_exact_pairs(spark):
    df = _corpus(spark)
    exact = {
        p
        for p, j in _exact_jaccard(spark, df).items()
        if j >= 0.6
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_exact_verified_pairs(
            df, "text", "doc_id", threshold=0.6
        ).collect()
    }
    assert got == exact


def test_simhash_exact_verified_equals_exact_pairs(spark):
    # mirror of the minhash test: at a wide-enough Hamming radius the
    # pigeonhole candidates recall every true pair, and the exact-Jaccard
    # verify makes the output equal the true pair set
    df = _corpus(spark)
    exact = {
        p
        for p, j in _exact_jaccard(spark, df).items()
        if j >= 0.6
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_exact_verified_pairs(
            df, "text", "doc_id", max_hamming=16, threshold=0.6
        ).collect()
    }
    assert got == exact
    # tight radius is a strict subset (precision side of the contract)
    tight = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_exact_verified_pairs(
            df, "text", "doc_id", max_hamming=0, threshold=0.6
        ).collect()
    }
    assert tight <= exact


def test_exact_dedup_identical_only(spark):
    df = spark.createDataFrame(
        [(1, "Same  Text here"), (2, "same text HERE"), (3, "different")],
        "doc_id long, text string",
    )
    out = dedup.exact_dedup(df, "text", "doc_id")
    groups = {r["keeper"]: r["n_copies"] for r in out.collect()}
    # normalization folds case/whitespace: docs 1 and 2 collide
    assert groups == {1: 2, 3: 1}


def test_keep_first_keep_cols_matches_default(spark):
    """r15 keep_cols projection: same keeper rows as the all-columns
    form (projected to the same columns), text provably absent from the
    dedup exchange, and id_col membership enforced."""
    df = spark.createDataFrame(
        [
            (1, "Same  Text here", "a"),
            (2, "same text HERE", "b"),
            (3, "different", "c"),
        ],
        "doc_id long, text string, tag string",
    )
    full = dedup.exact_dedup_keep_first(df, "text", "doc_id")
    slim = dedup.exact_dedup_keep_first(
        df, "text", "doc_id", keep_cols=["doc_id", "tag"]
    )
    assert slim.columns == ["doc_id", "tag"]
    assert sorted(map(tuple, slim.collect())) == sorted(
        (r["doc_id"], r["tag"]) for r in full.collect()
    )
    # the projection really precedes the exchange: no text attribute
    # above the shuffle (only inside the md5 fingerprint below it)
    plan = slim._jdf.queryExecution().executedPlan().toString()
    exchange_and_up = plan.split("Exchange hashpartitioning")[0]
    assert "text#" not in exchange_and_up
    with pytest.raises(ValueError, match="keep_cols must include id_col"):
        dedup.exact_dedup_keep_first(df, "text", "doc_id", keep_cols=["tag"])


def test_minhash_band_validation(spark):
    import pytest as _pytest

    from idb_backend_spark.operators import dedup

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="evenly divide"):
        dedup.minhash_lsh_pairs(df, "text", "doc_id", num_hashes=64, bands=100)
    with _pytest.raises(ValueError, match="evenly divide"):
        dedup.minhash_lsh_pairs(df, "text", "doc_id", num_hashes=64, bands=12)


def test_ivf_build_small_corpus(spark):
    """A corpus smaller than nlist must degrade to fewer buckets, not
    crash rebuilding centroids for empty seed slots."""
    from idb_backend_spark.operators import ann

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    assigned, cents = ann.ivf_build(df, nlist=16, iterations=2)
    assert 1 <= len(cents) <= 5
    assert assigned.count() == 5
    top = ann.ivf_topk(assigned, cents, [4.0, 1.0], k=3, nprobe=len(cents))
    assert top.count() == 3


def test_ivf_default_nlist_analyzes_and_runs(spark):
    """The nearest-centroid argmax must be a LINEAR expression tree: the
    old when-chain fold was exponential in nlist and OOMed the driver at
    the DEFAULT nlist=16 before reading any data."""
    import time

    rows = [(i, [float((i * 7 + j) % 13) for j in range(8)])
            for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    t0 = time.time()
    assigned, centroids = ann.ivf_build(df, nlist=16, iterations=1)
    top = ann.ivf_topk(assigned, centroids, rows[0][1], k=3, nprobe=16)
    got = top.collect()
    assert time.time() - t0 < 60  # the old tree took minutes/OOMed
    assert len(centroids) == 16
    assert got[0]["vec_id"] == 0 and abs(got[0]["cosine"] - 1.0) < 1e-6


def test_ivf_empty_corpus_degrades_gracefully(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assigned, centroids = ann.ivf_build(df, nlist=8)
    assert centroids == []
    assert assigned.count() == 0
    assert ann.ivf_topk(assigned, centroids, [1.0, 0.0], k=3).count() == 0


def test_ivf_duplicate_centroids_probe_the_occupied_bucket(spark):
    """_assign ties toward the LOWEST bucket index; _probe_buckets must
    break centroid-similarity ties the same way, or duplicate centroids
    send nprobe=1 queries to the empty twin bucket."""
    vecs = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    centroids = [[1.0, 0.0], [1.0, 0.0]]  # duplicate centroids
    assigned = ann._assign(df, centroids, "embedding")
    probe = ann._probe_buckets(centroids, [1.0, 0.0], nprobe=1)
    got = ann.ivf_topk(assigned, centroids, [1.0, 0.0], k=2, nprobe=1)
    assert probe == [0]
    assert {r["vec_id"] for r in got.collect()} == {0, 1}


def test_embedding_near_dup_tolerates_null_vectors(spark):
    """One stray null embedding must not disable dedup for the corpus
    (the old first-row dim probe read whatever row the plan surfaced
    first and fired the empty-input early-return on a null head)."""
    rows = [(0, None)] + [(i, [1.0, 2.0, 3.0]) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = dedup.embedding_near_dup_pairs(
        df, "embedding", "vec_id", threshold=0.9, n_bands=4, band_bits=2
    ).collect()
    # 4 identical vectors -> 6 pairs, none involving the null row
    assert len(pairs) == 6
    assert all(r["id_a"] != 0 and r["id_b"] != 0 for r in pairs)


def test_simhash_radius_64_raises(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.simhash_pairs(df, "text", "doc_id", max_hamming=64)


def test_remove_repeated_spans_goldens(spark):
    """Hand-verified span-removal semantics: duplicate-covered tokens
    go, canonical-span-covered tokens stay (incl. the self-overlap
    case where an unprotected rule would eat the canonical copy back
    to one token), short docs keep all tokens, output is the
    NORMALIZED token stream (lowercase, single-spaced — the documented
    contract), and NULL text degrades to ('', 0)."""
    rows = [
        (1, "a b c d e f"),      # holds the canonical a-b-c/b-c-d/c-d-e
        (2, "x y a b c d e z"),  # repeats spans of doc 1
        (3, "a a a a a a"),      # self-overlapping repeat
        (4, "p Q"),              # shorter than the window; case-folds
        (5, None),               # NULL text -> ('', 0), never NULL
        (6, "A  B\tC D e f"),    # normalizes to doc 1 -> pure boilerplate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in dedup.remove_repeated_spans(df, "text", "doc_id", 3).collect()
    }
    assert got == {
        1: ("a b c d e f", 0),
        # dup-covered positions 2..6 minus doc-2-canonical cover
        # {0,1,2,3,5,6,7} -> only 'c' (pos 4) is removed
        2: ("x y a b d e z", 1),
        # canonical first span 'a a a' survives; the tail goes
        3: ("a a a", 3),
        4: ("p q", 0),
        5: ("", 0),
        # every span of doc 6 is canonical in doc 1; nothing protected
        6: ("", 6),
    }
    with pytest.raises(ValueError, match="window"):
        dedup.remove_repeated_spans(df, "text", "doc_id", 1)


def test_remove_repeated_spans_matches_duckdb_twin(spark, sf_dir):
    """Row-for-row parity with the SQL twin over the real documents
    table — md5 span hashes, the keep-first ordering, the canonical
    protection rule, and the rebuild are all integer/string exact (no
    float caveat on this operator)."""
    import duckdb

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in dedup.remove_repeated_spans(
            docs, "text", "doc_id", 8
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            dedup.remove_repeated_spans_sql("documents", "text", "doc_id", 8)
        ).fetchall()
    }
    assert got == want
    # the synthetic corpus genuinely contains repeated spans — the
    # operator must have something to do, or this test proves nothing
    assert sum(v[1] for v in got.values()) > 0


def test_remove_repeated_spans_plan_shape(spark, sf_dir):
    """No Python evaluation, and the corpus token stream is never
    position-exploded through a shuffle: the only Generate nodes are
    the span explode (the position sets fold back per-doc as array
    expressions)."""
    import contextlib
    import io
    import re

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = dedup.remove_repeated_spans(docs, "text", "doc_id", 8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    text = buf.getvalue()
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    assert len(re.findall(r"\(\d+\) Generate", text)) == 1
