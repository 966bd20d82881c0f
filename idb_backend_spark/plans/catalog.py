"""The demo catalog — every operator from SURVEY §2 registered as a
driver-gradable (query, oracle) pair.

This module is the aggregation point: importing it registers every entry
in the topic modules (side-effect registration through the @query
decorator in plans.registry) and re-exports the registry surface the
driver contract (__spark_entry__) reads. The synthetic-input SQL
builders shared across modules live in plans.synth.

Grading-window rotation
-----------------------
The driver grades the FIRST 50 registered entries each round, so
registration order decides which entries get driver evidence. Rather
than relying on module import order (which let three round-4 entries —
keyset_deep_page, fulltext_skipping_scan, ann_batch_topk — land outside
the window and go ungraded), the order is now EXPLICIT: `_GRADE_FRONT`
below lists, by name, the entries that must occupy the first slots this
round, and `_reorder()` rebuilds Q/ORACLE in that order after all
modules register.

Rotation rule (enforced by tests/test_catalog_window.py): every entry
with no green row in the PREVIOUS round's CORRECTNESS artifact — which
automatically includes every entry added this round — must appear in
`_GRADE_FRONT`, and `_GRADE_FRONT` must fit inside the 50-entry window.
Round 5 therefore front-loads the three never-driver-graded round-4
entries, the new round-5 entries (including the q_scale maintenance
tier, which fills the window to exactly 50), and the 30 graded-entries
last green in round 3; the round-4-graded entries trail (re-grading
them is harmless — they were green, and every trailing entry keeps a
green row within the last two rounds).

The two sketch entries whose hash families are not SQL-expressible
(minhash_lsh_pairs, simhash_pairs) are registered graded=False: they
stay runnable (bench.py times them via UNGRADED) but no longer consume
grading slots as permanent no-oracle rows; their recall is oracle-proven
by minhash_exact_verified / simhash_exact_verified.
"""

from __future__ import annotations

from idb_backend_spark.plans.registry import (  # noqa: F401
    ORACLE,
    Q,
    UNGRADED,
    _t,
    query,
)

from idb_backend_spark.plans import (  # noqa: F401  (side-effect registration)
    q_download,
    q_parity,
    q_enrichment,
    q_relational,
    q_scale,
    q_shim,
    q_store,
    q_streaming,
    q_textsim,
)

# Entries that must land inside the driver's 50-entry grading window this
# round (round 5): never-driver-graded round-4 additions first, then new
# round-5 entries, then the complement last graded in round 3.
_GRADE_FRONT = [
    # --- never driver-graded (added round 4 outside the window) ---
    "keyset_deep_page",
    "fulltext_skipping_scan",
    "ann_batch_topk",
    # --- new round-5 entries ---
    "streaming_incremental_merge",
    "sessionize",
    "download_e2e",
    "document_chunking",
    "deterministic_split",
    "benchmark_contamination",
    "ingest_e2e",
    "streaming_exact_dedup",
    "sessionize_batch",
    "deterministic_sample",
    "repetition_quality",
    "pii_redaction",
    "store_compaction",
    "token_index_update",
    "ivf_incremental_ann",
    "salted_skew_agg",
    "training_corpus_e2e",
    # --- last graded round 3; re-grade this round per the rotation ---
    "shim_term_terms",
    "shim_range_prefix",
    "shim_exists_range",
    "shim_geo_bounding_box",
    "shim_geo_distance",
    "versioned_merge",
    "tombstone_deletes",
    "media_sniff_buckets",
    "media_derivatives",
    "etl_enrichment_pipeline",
    "raw_field_access",
    "stats_rollup_nested",
    "media_presence_flags",
    "identifier_extraction",
    "duplicate_clusters",
    "dwca_roundtrip",
    "delimited_roundtrip",
    "eml_harvest",
    "object_store_roundtrip",
    "index_sink_roundtrip",
    "exact_dedup",
    "token_count_quality",
    "doc_fingerprint",
    "lang_id_heuristic",
    "ngram_jaccard_pairs",
    "ann_cosine_topk",
    "embedding_near_dup",
    "minhash_exact_verified",
    "ivf_ann_topk",
    "corpus_curation_pipeline",
]


def _reorder() -> None:
    """Rebuild Q/ORACLE so _GRADE_FRONT entries register first (driver
    grades the first 50); the rest keep their module registration order."""
    front = [n for n in _GRADE_FRONT if n in Q]
    rest = [n for n in Q if n not in set(front)]
    order = front + rest
    q_ordered = {n: Q[n] for n in order}
    Q.clear()
    Q.update(q_ordered)
    o_ordered = {n: ORACLE[n] for n in order if n in ORACLE}
    ORACLE.clear()
    ORACLE.update(o_ordered)


_reorder()
