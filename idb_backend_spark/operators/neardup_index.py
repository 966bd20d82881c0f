"""Persistent MinHash/LSH near-dup index — dedup NEW batches against the
accepted corpus without rescanning the corpus.

The batch tiers (operators/dedup.py) answer "which pairs inside THIS
frame are near-duplicates". A 100 TB deployment's steady state is the
other question: an ingest batch arrives and must be checked against
everything already accepted. Re-signaturing the full corpus per batch is
O(corpus) per batch; this module makes the recurring cost O(batch):

  build_neardup_index    bootstrap: one corpus pass -> parquet index
  probe_neardup_index    batch -> (new_id, corpus_id, jaccard) matches
  add_to_neardup_index   accepted batch joins the index (append-only)

This composes with the rest of the maintenance tier the same way the
token skip-index does for fulltext (plans/skipping.py) and the frozen
codebook does for IVF (operators/ann.ivf_add_vectors): bootstrap once,
then every batch pays only for itself. There is no reference-repo
counterpart (idb-backend dedups at etag granularity only —
postgres_backend/db.py's content-addressed `data` table); the sketch
family is the standard banded-MinHash construction (Broder; Leskovec et
al., "Mining of Massive Datasets" ch. 3).

Index layout — ONE parquet row dataset plus a tiny immutable sidecar:

  {path}/rows: (id, band, key, sig)  — `bands` rows per document, where
      `sig` is the FULL lane array, repeated on every band row
      deliberately. The repetition buys two structural properties:
      each add is ONE parquet append (no sibling dataset that could
      commit or vacuum separately — the ivf_add_vectors crash contract:
      a crashed add leaves at most missing documents, never
      half-indexed ones), and ANY single band's rows are a complete
      (id, sig) store — the probe's estimate stage fetches corpus
      signatures from the band-0 slice alone (row-group-pruned via the
      (band, key) file clustering), while its discovery stage
      column-prunes `sig` away entirely and scans only (id, band, key).
      At the default geometry the repetition is bands x num_hashes x
      8 B = 8 KB per document — well under 1% of typical document
      payloads, and no probe stage ever reads more than 1/bands of it.
  {path}/meta: one row (shingle_k, num_hashes, bands, seed,
      text_version) written at build time and never touched again.
      probe/add READ their hash geometry from it instead of trusting
      caller arguments, so a probe compiled months after the build can
      never hash differently than the index; text_version additionally
      pins the engine's text-canonicalizer generation, so an index
      hashed under an older tokenizer fails loudly instead of silently
      missing every duplicate. A REBUILD over an existing index stages
      the new meta+rows in a sibling directory and swaps it in with
      renames — a crash mid-swap leaves a missing index (probes fail
      loudly on the absent meta), never new-geometry rows under
      old-geometry meta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idb_backend_spark.operators.dedup import (
    _band_structs,
    _shingle_df,
    minhash_signatures,
)

#: Bumped whenever the text canonicalization feeding the shingles changes
#: (functions/text.py — e.g. the v2 cross-engine case fold). Persisted in
#: the index meta and validated on every read: an index hashed under an
#: older tokenizer must be REBUILT, not silently probed with new-tokenizer
#: shingles (an exact duplicate of an indexed doc would produce no band
#: match and sail through the gate).
TEXT_VERSION = 2

_META_COLS = ("shingle_k", "num_hashes", "bands", "seed", "text_version")


def _rows_path(index_path: str) -> str:
    return index_path.rstrip("/") + "/rows"


def _meta_path(index_path: str) -> str:
    return index_path.rstrip("/") + "/meta"


def read_meta(spark: SparkSession, index_path: str) -> dict:
    """The index's hash geometry, as built (see module docstring).
    Raises if the index was hashed under a different text-canonicalizer
    version than this build of the engine — rebuild it."""
    row = spark.read.parquet(_meta_path(index_path)).collect()[0]
    fields = set(row.__fields__)
    # ONLY text_version may be absent (a meta written before the pin
    # existed IS version 1 — the whole point is telling THAT population
    # to rebuild, so the lookup must not die on the missing column
    # first). Any OTHER missing geometry column means a truncated or
    # corrupt meta: defaulting it would silently yield a probe that
    # hashes nothing like the index, so it fails loudly instead.
    missing = [c for c in _META_COLS if c not in fields and c != "text_version"]
    if missing:
        raise ValueError(
            f"index meta at {index_path} is missing geometry columns "
            f"{missing}: the sidecar is truncated or corrupt — rebuild "
            "with build_neardup_index"
        )
    meta = {
        c: (int(row[c]) if c in fields else 1) for c in _META_COLS
    }
    if meta["text_version"] != TEXT_VERSION:
        raise ValueError(
            f"index at {index_path} was built with text_version "
            f"{meta['text_version']}, engine is {TEXT_VERSION}: its "
            "shingle hashes no longer match what probes would compute — "
            "rebuild with build_neardup_index"
        )
    return meta


def _null_safe(df: DataFrame, text_col: str) -> DataFrame:
    """NULL text folds to '' BEFORE any tokenization, on every path
    (build, add, probe, exact verify) — mirrored by coalesce in the SQL
    twin. Without it, NULL-text docs hash to all-NULL signatures that
    pair with each OTHER at estimate 1.0 on the engine while the twin's
    shingle join drops NULL grams entirely."""
    return df.withColumn(
        text_col, F.coalesce(F.col(text_col), F.lit(""))
    )


def _check_id_contract(df: DataFrame, what: str) -> int:
    """Enforce the index's id contract on a one-``id``-column frame —
    non-null, row-unique — and return the row count. Shared by build
    and add so the bootstrap corpus is held to the SAME rule as every
    later batch: duplicate ids would min-fold both documents' shingles
    into one blended signature matching neither (real duplicates of
    either doc then evade every later probe), and NULL ids can never be
    probed (id != new_id is NULL) or replay-guarded (NULL joins
    nothing). One bounded aggregate over the id column."""
    counts = df.agg(
        F.count("*").alias("n"),
        F.count_distinct("id").alias("nd"),
        F.count_if(F.col("id").isNull()).alias("nn"),
    ).collect()[0]
    n, n_distinct, n_null = int(counts["n"]), int(counts["nd"]), int(counts["nn"])
    if n_null:
        # count_distinct ignores NULLs, so without this arm a single
        # NULL id would be misreported as a duplicate
        raise ValueError(
            f"{what} has {n_null} NULL ids: index ids must be non-null "
            "(the md5-keyed-op contract) — they cannot be probed, "
            "deduped, or replay-guarded"
        )
    if n != n_distinct:
        raise ValueError(
            f"{what} has {n - n_distinct} duplicate ids: "
            "minhash signatures are per-id lane minima, so duplicate ids "
            "would blend both documents' shingles into one signature "
            "matching neither — dedup by id first"
        )
    return n


def _broadcast_bytes_cap(spark: SparkSession) -> int:
    """The session's autoBroadcastJoinThreshold in bytes (-1 = never
    force a broadcast here; AQE may still convert at runtime)."""
    raw = str(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    for suffix, mult in units.items():
        for s in (suffix + "b", suffix):
            if raw.endswith(s):
                return int(float(raw[: -len(s)])) * mult
    # Spark also accepts a bare-bytes suffix ('10485760b')
    if raw.endswith("b"):
        raw = raw[:-1]
    return int(raw)


def _gate_broadcast(
    df: DataFrame, est_bytes: int, spark: SparkSession
) -> DataFrame:
    """Broadcast ``df`` only when its estimated size fits the session's
    broadcast threshold (the runtime-size-gate discipline of
    operators/lm.py): the probe/replay-guard contract is "small batch
    vs huge corpus", but a large ingest batch must DEGRADE to a plain
    shuffled join, not blow the broadcast limit — same answer, heavier
    exchange. With the threshold at -1 the frame is never force-
    broadcast (AQE may still convert if runtime stats allow)."""
    cap = _broadcast_bytes_cap(spark)
    if 0 <= cap < est_bytes:
        return df
    return F.broadcast(df)


def _index_rows(
    df: DataFrame, text_col: str, id_col: str, meta: dict
) -> DataFrame:
    """(id, band, key, sig) index rows for a document frame — the one
    shared builder, so build and add can never derive different rows."""
    sig = minhash_signatures(
        _null_safe(df, text_col),
        text_col,
        id_col,
        shingle_k=meta["shingle_k"],
        num_hashes=meta["num_hashes"],
        seed=meta["seed"],
    )
    lanes = F.array(
        *[F.col(f"m{j}") for j in range(meta["num_hashes"])]
    ).alias("sig")
    return sig.select(
        "id",
        F.explode(
            F.array(*_band_structs(meta["num_hashes"], meta["bands"]))
        ).alias("bk"),
        lanes,
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"), "sig")


def _stage_and_swap(
    spark: SparkSession, root: str, write_staging, pre_swap=None
) -> None:
    """Write a full index (meta + rows) under ``{root}__staging`` via the
    ``write_staging(staging_path)`` callback, then promote it with
    CHECKED renames — Hadoop FileSystem.rename reports failure by
    returning False, not raising, so an unchecked swap could delete the
    only live copy after a silent no-op rename (or nest the staging dir
    INSIDE a still-present root). ``pre_swap`` (optional) runs after the
    staging write and before the first rename; if it raises, the staged
    tree is deleted and the live index is left untouched — the hook
    compaction uses to abort when a concurrent add committed after its
    snapshot. Failure order is safe at every step: before the first
    successful rename the live index is untouched; between the renames
    the root is missing and probes fail loudly on the absent meta; the
    backup is deleted only after the promotion rename succeeded."""
    jvm = spark.sparkContext._jvm
    hroot = jvm.org.apache.hadoop.fs.Path(root)
    fs = hroot.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    staging = root + "__staging"
    backup = root + "__old"
    hstage = jvm.org.apache.hadoop.fs.Path(staging)
    hback = jvm.org.apache.hadoop.fs.Path(backup)
    fs.delete(hstage, True)
    fs.delete(hback, True)
    write_staging(staging)
    if pre_swap is not None:
        try:
            pre_swap()
        except Exception:
            fs.delete(hstage, True)
            raise
    if fs.exists(hroot):
        if not fs.rename(hroot, hback):
            raise IOError(
                f"could not move live index {root} aside to {backup}; "
                "index left untouched, staging kept at "
                f"{staging} for inspection"
            )
    if not fs.rename(hstage, hroot):
        raise IOError(
            f"could not promote staged index {staging} to {root}; "
            f"previous index preserved at {backup}"
        )
    fs.delete(hback, True)


def _write_meta(spark: SparkSession, meta: dict, index_path: str) -> None:
    spark.createDataFrame(
        [tuple(meta[c] for c in _META_COLS)],
        ", ".join(f"{c} int" for c in _META_COLS),
    ).coalesce(1).write.mode("overwrite").parquet(_meta_path(index_path))


def build_neardup_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    index_path: str,
    shingle_k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> None:
    """Bootstrap: one corpus pass writes the index (overwriting any
    previous build at ``index_path``).

    Rows are sorted by (band, key) within write partitions so parquet
    row-group min/max stats on `key` stay tight — a probe pushed down as
    a key filter skips row groups; the bucket join reads clustered keys.
    """
    if bands > num_hashes or num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must evenly divide num_hashes ({num_hashes})"
        )
    spark = df.sparkSession
    # the bootstrap corpus is held to the same id contract as every
    # add batch — a duplicate or NULL id at build time corrupts the
    # index just as silently as one at add time (one bounded
    # id-column aggregate; the corpus itself is scanned once more for
    # the signature pass below)
    _check_id_contract(df.select(F.col(id_col).alias("id")), "corpus")
    meta = {
        "shingle_k": int(shingle_k),
        "num_hashes": int(num_hashes),
        "bands": int(bands),
        "seed": int(seed),
        "text_version": TEXT_VERSION,
    }
    # Stage the whole index (meta + rows) in a sibling dir, then swap by
    # checked renames — never overwrite in place: a crash between an
    # in-place meta write and the rows write during a geometry-CHANGING
    # rebuild would leave new meta over old rows, a silently corrupt
    # index that probes without error and misses everything.

    def _write(staging: str) -> None:
        _write_meta(spark, meta, staging)
        (
            _index_rows(df, text_col, id_col, meta)
            .sortWithinPartitions("band", "key")
            .write.mode("overwrite")
            .parquet(_rows_path(staging))
        )

    _stage_and_swap(spark, index_path.rstrip("/"), _write)


def present_ids(
    spark: SparkSession, index_path: str, ids: DataFrame,
    n_ids: int | None = None,
) -> DataFrame:
    """The subset of ``ids`` (a one-column frame named ``id``) already in
    the index — an id-column-pruned scan of the index with the probe set
    broadcast WHEN IT FITS the session broadcast threshold (size-gated:
    a retried million-doc batch degrades to a shuffled semi-join instead
    of blowing the broadcast limit), one bounded job, the corpus never
    shuffled. ``n_ids`` skips the sizing count when the caller already
    knows it. Shared by the add's idempotency check and the streaming
    gate's replay guard, so the gate never reaches into the index's
    physical layout."""
    probe = ids.select("id")
    if n_ids is None:
        n_ids = probe.count()
    return (
        spark.read.parquet(_rows_path(index_path))
        .select("id")
        .join(_gate_broadcast(probe, n_ids * 48, spark), "id", "left_semi")
        .distinct()
    )


def add_to_neardup_index(
    new_docs: DataFrame,
    text_col: str,
    id_col: str,
    index_path: str,
    assume_fresh: bool = False,
) -> int:
    """Append an accepted batch to the index; returns the number of
    documents actually added.

    Idempotent under re-runs: ids already present are skipped (a
    distributed anti-join against `present_ids` — never a driver-side
    literal list, which a retried million-doc batch would blow up), so
    a crash-retry cannot double-index documents. Callers that have
    ALREADY anti-joined the batch against the index this micro-batch
    (the streaming gate) pass ``assume_fresh=True`` to skip the repeat
    scan. The append itself is one parquet job — it commits whole or
    not at all.

    Batch ids must be row-unique: duplicate ids would min-fold into one
    BLENDED signature matching neither document, so they raise.
    """
    spark = new_docs.sparkSession
    meta = read_meta(spark, index_path)
    batch = new_docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias(text_col)
    )
    if assume_fresh:
        fresh = batch
    else:
        # pin: the anti-join (an index id-column scan) feeds BOTH the
        # count/guard agg and the index-rows write — without the pin the
        # index would be scanned twice per add
        fresh = batch.join(
            present_ids(spark, index_path, batch.select("id")),
            "id",
            "left_anti",
        ).localCheckpoint(eager=True)
    n_fresh = _check_id_contract(fresh.select("id"), "batch")
    if n_fresh == 0:
        return 0
    _index_rows(fresh, text_col, "id", meta).sortWithinPartitions(
        "band", "key"
    ).write.mode("append").parquet(_rows_path(index_path))
    return n_fresh


def probe_neardup_index(
    new_docs: DataFrame,
    text_col: str,
    id_col: str,
    index_path: str,
    threshold: float = 0.5,
    verify: str = "estimate",
    corpus: DataFrame | None = None,
) -> DataFrame:
    """Match a new batch against the indexed corpus: returns one row per
    (new_id, corpus_id) candidate surviving verification.

    verify="estimate" (default): signature-lane agreement >= threshold —
    the index alone decides; the corpus is never read. Columns
    (new_id, corpus_id, est_jaccard).

    verify="exact": candidates are re-checked against the TRUE shingle
    Jaccard, which needs the candidate documents' text — pass the corpus
    frame; only the candidate corpus docs are shingled (semi-join on the
    candidate id set, bounded by candidates, NOT a corpus scan). Output
    (new_id, corpus_id, jaccard) is then a subset of the true
    cross-pair set at the threshold — equal to it when the bands recall
    every true pair, the same containment contract the graded
    minhash_exact_verified entry proves for the in-frame tier.

    Probe plan at scale (r9 two-stage restructure — measured 5.6x at a
    500 k-doc index, identical output):

    * DISCOVERY scans only (id, band, key) of the index — the repeated
      ``sig`` arrays (the overwhelming share of index bytes, ~8 KB/doc
      x bands) are column-pruned away entirely. The batch side
      (band keys, NO sig — ~80 B/doc/band, so the broadcast fits far
      larger batches than the old sig-carrying side did) is broadcast
      when it fits the session threshold (size-gated; over it the probe
      degrades to a plain (band, key) join — same answer, heavier
      exchange). The index is never shuffled, and a batch id equal to
      an indexed id never matches itself.
    * The ESTIMATE fetch reads each candidate's corpus signature from
      the ``band == first-band`` slice of the same rows dataset (every
      band row repeats the full sig, so any one band is a complete
      (id, sig) source); build/add/compact all cluster files by
      (band, key), so the pushed band filter row-group-prunes that
      scan to ~1/bands of the bytes. The candidate side of the fetch
      join is deliberately UNHINTED — its size is runtime-dependent, so
      AQE broadcast-converts from actual stats instead of a guessed
      estimate (a pathological all-match batch degrades to a shuffle
      join rather than an OOM broadcast). verify="exact" needs no
      corpus signatures and skips the fetch altogether.

    (A pushed key-IN filter was prototyped and REJECTED: band keys are
    uniform hashes, so a batch's key set hits every row group of the
    range-clustered files — no skipping, plus per-row In evaluation;
    measured 1.8x SLOWER than even the old full-width join.)
    """
    if verify not in ("estimate", "exact"):
        raise ValueError(f"verify must be 'estimate' or 'exact', got {verify!r}")
    if verify == "exact" and corpus is None:
        raise ValueError("verify='exact' needs the corpus frame")
    spark = new_docs.sparkSession
    meta = read_meta(spark, index_path)
    # ONE minhash pass serves both stages (band keys for discovery,
    # lane arrays for the estimate): pinned via localCheckpoint —
    # n_batch x num_hashes longs, spilling to disk if a huge batch
    # outgrows storage memory
    sig = minhash_signatures(
        _null_safe(new_docs, text_col),
        text_col,
        id_col,
        shingle_k=meta["shingle_k"],
        num_hashes=meta["num_hashes"],
        seed=meta["seed"],
    ).localCheckpoint(eager=True)
    # sizing count reads the just-checkpointed blocks — no extra scan
    # of the batch, no second minhash pass
    n_batch = sig.count()
    new_keys = sig.select(
        F.col("id").alias("new_id"),
        F.explode(
            F.array(*_band_structs(meta["num_hashes"], meta["bands"]))
        ).alias("bk"),
    ).select("new_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    idx = spark.read.parquet(_rows_path(index_path))
    key_bytes = n_batch * meta["bands"] * 80
    cand = (
        idx.select("id", "band", "key")
        .join(_gate_broadcast(new_keys, key_bytes, spark), ["band", "key"])
        .filter(F.col("id") != F.col("new_id"))
        .select("new_id", F.col("id").alias("corpus_id"))
        # a pair found in several bands is still one candidate; the
        # dedup shuffle is bounded by candidate count, not corpus size
        .dropDuplicates(["new_id", "corpus_id"])
    )
    if verify == "estimate":
        lanes = F.array(
            *[F.col(f"m{j}") for j in range(meta["num_hashes"])]
        )
        new_sigs = sig.select(
            F.col("id").alias("new_id"), lanes.alias("new_sig")
        )
        sig_bytes = n_batch * (meta["num_hashes"] * 8 + 64)
        # candidate side LEFT, band-0 slice RIGHT: with parquet stats the
        # static planner broadcasts the slice only when it is actually
        # small; at scale it falls to a shuffle join and AQE re-plans
        # from runtime sizes (usually broadcasting the candidates)
        fetched = (
            cand.join(
                idx.filter(F.col("band") == 0).select(
                    F.col("id").alias("corpus_id"),
                    F.col("sig").alias("corpus_sig"),
                ),
                "corpus_id",
            )
            .join(_gate_broadcast(new_sigs, sig_bytes, spark), "new_id")
        )
        est = F.size(
            F.filter(
                F.zip_with("new_sig", "corpus_sig", lambda x, y: x == y),
                lambda m: m,
            )
        ) / F.lit(float(meta["num_hashes"]))
        return (
            fetched.withColumn("est_jaccard", F.round(est, 6))
            .filter(F.col("est_jaccard") >= threshold)
            .select("new_id", "corpus_id", "est_jaccard")
        )
    pairs = cand
    cand_corpus = corpus.join(
        pairs.select(F.col("corpus_id").alias(id_col)).distinct(),
        id_col,
        "left_semi",
    )
    sh_new = _shingle_df(
        _null_safe(new_docs, text_col), text_col, id_col, meta["shingle_k"]
    ).select(F.col("id").alias("new_id"), F.col("sh").alias("sh_a"))
    sh_corpus = _shingle_df(
        _null_safe(cand_corpus, text_col), text_col, id_col, meta["shingle_k"]
    ).select(F.col("id").alias("corpus_id"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        pairs.join(sh_new, "new_id")
        .join(sh_corpus, "corpus_id")
        # exact-ratio filter, rounded for display — the shared contract
        # with minhash_exact_verified_pairs / synth's Jaccard oracle
        .filter(jac >= threshold)
        .withColumn("jaccard", F.round(jac, 6))
        .select("new_id", "corpus_id", "jaccard")
    )


def probe_neardup_exact_sql(
    table: str,
    text_col: str,
    id_col: str,
    batch_pred: str,
    corpus_pred: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> str:
    """DuckDB twin of ``probe_neardup_index(verify="exact")`` — the TRUE
    cross-pair set between the batch rows (``batch_pred``) and corpus
    rows (``corpus_pred``) of ``table`` at the threshold (the
    sub-``shingle_k``-token fallback shingle is the whole token list,
    matching functions.similarity.shingles_from_tokens). The engine's
    output must be a SUBSET of this set — equal when the LSH bands
    recall every true pair — the same containment contract the graded
    minhash_exact_verified entry proves for the in-frame tier (pattern:
    plans/synth.EXACT_JACCARD_SQL, parameterized for a cross join and
    arbitrary k)."""
    from idb_backend_spark.functions.text import norm_sql

    k = int(shingle_k)
    # coalesce mirrors the engine's _null_safe: NULL text behaves as ''
    null_safe_col = f"coalesce({text_col}, '')"
    toks = f"string_split_regex({norm_sql(null_safe_col)}, ' ')"
    return (
        f"WITH sh AS (SELECT {id_col} AS id, sz, g FROM ("
        f"  SELECT {id_col}, toks, len(toks) AS n FROM ("
        f"    SELECT *, {toks} AS toks FROM {table} "
        f"    WHERE ({batch_pred}) OR ({corpus_pred}))) t, "
        f"  LATERAL (SELECT list_distinct(CASE WHEN n >= {k} THEN "
        f"    [array_to_string(toks[i:i+{k - 1}], ' ') "
        f"     FOR i IN range(1, n - {k - 2})] "
        "    ELSE [array_to_string(toks, ' ')] END) AS grams) gr, "
        "  LATERAL (SELECT len(gr.grams) AS sz) z, "
        "  LATERAL unnest(gr.grams) AS u(g)), "
        f"b AS (SELECT * FROM sh WHERE id IN ("
        f"  SELECT {id_col} FROM {table} WHERE {batch_pred})), "
        f"c AS (SELECT * FROM sh WHERE id IN ("
        f"  SELECT {id_col} FROM {table} WHERE {corpus_pred})), "
        "pairs AS (SELECT b.id AS new_id, c.id AS corpus_id, "
        "  count(*) AS shared, any_value(b.sz) AS sz_b, "
        "  any_value(c.sz) AS sz_c "
        "  FROM b JOIN c USING (g) WHERE b.id <> c.id "
        "  GROUP BY b.id, c.id) "
        "SELECT new_id, corpus_id, "
        "round(shared / (sz_b + sz_c - shared), 6) AS jaccard "
        f"FROM pairs WHERE shared / (sz_b + sz_c - shared) >= {threshold} "
        "ORDER BY new_id, corpus_id"
    )

def compact_neardup_index(spark: SparkSession, index_path: str) -> int:
    """Rewrite the rows dataset after many appends; returns the file
    count after compaction.

    Each ``add_to_neardup_index`` lands its own parquet files, so a
    long-lived index fragments into per-batch files whose (band, key)
    ranges all overlap — probe scans then read every file. Compaction
    rewrites the rows range-partitioned and sorted on (band, key)
    (globally clustered: each output file owns a disjoint key range, so
    row-group min/max stats prune tightly again) and swaps it in with
    the same staged-rename dance as a rebuild — a crash mid-swap leaves
    a loudly-missing index, never a half-compacted one. Meta is copied
    unchanged: compaction is purely physical. The streaming analog of
    operators/store.compact_history for the bucketed store.

    SINGLE-WRITER REQUIREMENT: stop adds (pause the streaming gate)
    while compacting. The rewrite reads a snapshot of the rows file
    listing; an add that commits between the snapshot and the swap
    would be silently dropped from the compacted index — un-indexing
    already-accepted documents. The requirement is ENFORCED, not just
    stated: the file listing is re-taken after the staged rewrite and
    compared to the snapshot; on any change the staged tree is deleted
    and the swap aborts with a RuntimeError, leaving the live index
    (including the concurrent add) untouched.
    """
    meta = read_meta(spark, index_path)  # also validates text_version
    root = index_path.rstrip("/")

    def _list_rows() -> list[str]:
        # bust the shared FileStatusCache, or the second listing would
        # just replay the first one's snapshot
        spark.catalog.refreshByPath(_rows_path(root))
        return sorted(spark.read.parquet(_rows_path(root)).inputFiles())

    before = _list_rows()
    # the staged rows must be fully materialized BEFORE the swap moves
    # the source directory out from under the lazy reader
    src_rows = spark.read.parquet(_rows_path(root))

    def _write(staging: str) -> None:
        _write_meta(spark, meta, staging)
        (
            src_rows.repartitionByRange("band", "key")
            .sortWithinPartitions("band", "key")
            .write.mode("overwrite")
            .parquet(_rows_path(staging))
        )

    def _abort_on_concurrent_write() -> None:
        after = _list_rows()
        if after != before:
            raise RuntimeError(
                f"rows under {root} changed during compaction "
                f"({len(before)} -> {len(after)} files): a writer "
                "committed after the compaction snapshot; swap aborted, "
                "live index untouched — stop adds and re-run "
                "compact_neardup_index"
            )

    _stage_and_swap(spark, root, _write, pre_swap=_abort_on_concurrent_write)
    spark.catalog.refreshByPath(_rows_path(root))
    return len(spark.read.parquet(_rows_path(root)).inputFiles())
