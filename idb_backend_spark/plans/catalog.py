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
the window and go ungraded), the front of the registration order is now
COMPUTED: `_grade_front()` reads the latest CORRECTNESS_r*.json in the
repo root and returns every entry with no green row there — which
automatically includes every entry added since that artifact — and
`_reorder()` rebuilds Q/ORACLE so those entries occupy the first slots.

Rotation rule (enforced by tests/test_catalog_window.py): the computed
front must fit inside the 50-entry window. With the catalog at exactly
100 entries this alternates the two halves round by round with no
manual flip — each half is re-graded every other round. A red or
errored row stays in the computed front; at the 100-entry ceiling that
overflows the window and fails the rotation tests until an entry is
retired — deliberate: a failing entry can never silently rotate out of
grading. Adding an entry likewise requires retiring one (the window
keeps at most 2x50 entries fresh within two rounds).

The two sketch entries whose hash families are not SQL-expressible
(minhash_lsh_pairs, simhash_pairs) are registered graded=False: they
stay runnable (bench.py times them via UNGRADED) but no longer consume
grading slots as permanent no-oracle rows; their recall is oracle-proven
by minhash_exact_verified / simhash_exact_verified.

Round-6 retirements: total_count, stats_daily_rollup, keyset_pagination
(each redundantly covered — see the comments at their former
registration sites) freed slots for export_jobs_queue and
video_frame_sample at 99 total; a second pass retired date_features and
bpe_token_count (both single-expression entries whose operator classes
stay graded by date_fallback_assembly / token_count_quality +
text_quality_metrics) for mixture_sample and sequence_packing — the
domain-mixing and context-window-packing steps of the training
pipeline, which were unit-only. The sessionize/sessionize_batch pair
was deliberately NOT folded: the streaming and batch operators are
distinct code paths (applyInPandasWithState vs gaps-and-islands) and
each needs its own driver evidence. A third pass retired max_watermark
(see q_relational) for quantized_cosine_topk.

Grading queue (operators implemented, unit-tested, twin-SQL ready,
waiting for a window slot — if a round grades its whole 50-entry front
green, the NEXT round's front is one short and a new entry fits with no
retirement): 1. epoch_shuffle (operators/sampling.py:194, plan-asserted
one range exchange); 2. bigram_lm_score (operators/lm.py, DuckDB twin
bigram_lm_score_sql already parity-tested in tests/test_lm.py — mind
the float-avg rounding-boundary caveat in its docstring);
3. tfidf_top_terms (operators/tfidf.py, twin tfidf_top_terms_sql,
integer-deterministic ranking so only the score column carries the
6-dp caveat — tests/test_tfidf.py); 4. hll_distinct_audit /
5. quantile_audit (operators/sketches.py, contract-twin SQL builders,
within-bound booleans graded like minhash_exact_verified's recall —
tests/test_sketches.py); 6. nb_quality_score (operators/classifier.py,
the model-based quality-filter stage — hashed multinomial NB, one
training pass + broadcast-join scoring, twin nb_quality_score_sql
parity-tested in tests/test_classifier.py; integer counts and pred are
exact, score carries the standard 6-dp caveat); 7. cap_per_domain
(operators/sampling.py — the hard max-docs-per-host ceiling; salted
two-level rank proven equal to the single-window semantics and to the
DuckDB twin in tests/test_properties.py, fully integer-deterministic so
a gate slot carries no float caveat at all); 8. pq_recall_audit
(operators/pq.py — product-quantization ADC + exact re-rank, the
memory-bound ANN tier above IVF/SQ8; audit-contract grading like the
sketch tiers, encoder proven against a numpy replica in
tests/test_pq.py); 9. remove_repeated_spans (operators/dedup.py —
substring-level dedup: strips corpus-wide repeated token spans while
protecting the canonical first occurrence; twin
remove_repeated_spans_sql row-for-row in tests/test_dedup_quality.py,
fully string/integer exact); 10. incremental near-dup probe
(operators/neardup_index.py — persistent MinHash/LSH index with
O(batch) steady-state probe/add, the maintenance-tier sibling of
token_index_update/ivf_incremental_ann; exact-verify mode equals the
probe_neardup_exact_sql twin row-for-row in tests/test_neardup_index.py
at the graded scale, string/integer exact except the shared 6-dp
Jaccard rounding contract); 11. cms_heavy_hitters
(operators/sketches.py — EXACT heavy hitters behind a Count-Min
prefilter with a zero-false-negative guarantee, so its twin
heavy_hitters_sql is plain GROUP BY ... HAVING and the entry is fully
integer/string exact; proven row-for-row incl. forced-collision widths
in tests/test_sketches.py).
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

# The grading front is COMPUTED, not hand-listed: every entry with no
# FULLY green row (rows + schema + value hash — a rows-only match is a
# value-level failure, see collection_counts_pivot in CORRECTNESS_r01)
# in the latest CORRECTNESS artifact leads registration, in module
# registration order; that automatically includes every entry added
# since the artifact was recorded. With the catalog at 100 entries and
# a 50-slot window, this alternates the two halves round by round with
# no manual flip. A red/errored row stays in the computed front, which
# then holds 51 names — tests/test_catalog_window.py fails the build
# until an entry is retired to make room, so a red row can never be
# silently rotated out of grading (the window cannot keep more than
# 2x50 entries fresh within two rounds; the test is the alarm, not a
# formality).


def _grade_front() -> list[str]:
    import json
    import os
    import re as _re

    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    arts = [
        f
        for f in os.listdir(repo)
        if _re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
    ]
    # numeric round order — lexicographic sort misreads r100 < r99 and
    # unpadded names like r5 vs r04
    arts.sort(key=lambda f: int(_re.search(r"r(\d+)", f).group(1)))
    green: set[str] = set()
    if arts:
        try:
            with open(os.path.join(repo, arts[-1])) as fh:
                prev = json.load(fh)
            green = {
                n
                for n, row in prev.items()
                if isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            }
        except (OSError, ValueError):
            green = set()
    return [n for n in Q if n not in green]


_GRADE_FRONT = _grade_front()


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
