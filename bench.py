"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline set exercises the scale-critical plan shapes: window
top-1-per-key over the fact table, symmetrized-union aggregation, semi-join
cross-filter, hash aggregations, exact + MinHash-LSH dedup, and brute-force
cosine top-k.

Timing materializes every output column through the `noop` sink
("materialization": "noop" in the JSON). Rounds 1-5 timed `.count()`,
which lets Catalyst PRUNE the projected expressions — a pure-projection
query like the enrichment pipeline was being timed as scan+count with
none of its columns computed (measured: 1.6 s counted vs ~19 s fully
materialized at sf0.1). Totals from r6 onward are therefore honest but
NOT comparable to earlier rounds' artifacts.

Each query is timed TWICE and the MINIMUM reported ("timing":
"min_of_2" in the JSON). This is noise control, not cherry-picking:
the host shows episodic multi-second stalls (the same 1.1 s query
measured 13.2 s in one run and 1.2 s in the next with zero guest-side
load), and a single-shot total is dominated by whichever query the
stall lands on. The minimum of two runs measures the plan; both raw
samples are preserved under "samples" so the variance stays visible.

"noise_canary" (r8+, additive — the frozen methodology-2 timing above
is untouched): ONE fixed query re-materialized 5 extra times after the
timed loop, its raw wall times recorded with their min/max. Same-code
totals on this host have spanned 13.0-22.8 s within one hour (r7
adjudication), so a cross-round total delta is only readable next to
that round's own canary spread: if the canary spread swallows the
delta, the delta is host weather, not a plan change.

"noise_canary_pre" (r9+, additive): the SAME canary run once more
BEFORE the timed loop, so a mid-run load shift — host weather arriving
or leaving while the headline loop runs, exactly the r8 adjudication's
contaminated 19.9 s run — is visible INSIDE one artifact: a pre/post
spread mismatch means the loop was timed under changing load and its
per-query deltas should be read against the WIDER of the two spreads.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "shim_term_terms",
    "latest_object_per_url",
    "version_numbering",
    "sibling_symmetrize",
    "crossfilter_semi_join",
    "citation_counts",
    # r6: stats_daily_rollup's catalog entry was retired; the nested A7
    # shape (same rollup plus the freq-map agg) carries the timing now
    "stats_rollup_nested",
    "majority_vote",
    "exact_dedup",
    "token_count_quality",
    "lang_id_heuristic",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "ann_cosine_topk",
    "etl_enrichment_pipeline",
    "datum_shift_molodensky",
    "corpus_curation_pipeline",
    # r11 promotions (S15/P15) — keep their timings on the headline so
    # the serving-view join and the dominance rollup stay perf-tracked
    "media_serving_table",
    "datasets_index_codes",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1  # path contains 'sf' without a trailing number

    from idb_backend_spark.plans.catalog import Q, UNGRADED
    from idb_backend_spark.session import get_spark

    runnable = {**Q, **UNGRADED}

    spark = get_spark("idb-backend-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/whole-stage-codegen paths by running every headline query
    # once at the smallest scale factor (different data — only code paths
    # warm, no result reuse). An engine serving queries runs warm; cold-JVM
    # timings would measure JIT, not the plans.
    def materialize(df) -> None:
        # noop sink: full evaluation of every output column, no bytes
        # written — count() would let Catalyst prune the projections
        df.write.format("noop").mode("overwrite").save()

    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        try:
            materialize(runnable[name](spark, warm_dir))
        except Exception as e:
            print(f"# warmup {name} failed: {e}", file=sys.stderr)

    # host-noise canary (additive context, NOT part of the total or the
    # per-query timings): one fixed mid-weight headline query, 5 repeat
    # materializations; the spread calibrates how much of a cross-round
    # total delta this host can produce on its own. Run BEFORE and AFTER
    # the timed loop (r9) so a mid-run load shift shows inside one
    # artifact as a pre/post spread mismatch.
    canary_q = "majority_vote"

    def run_canary(tag: str) -> list[float]:
        out: list[float] = []
        try:
            df = runnable[canary_q](spark, sf_dir)
            for _ in range(5):
                t0 = time.time()
                materialize(df)
                out.append(round(time.time() - t0, 3))
        except Exception as e:
            print(f"# noise canary ({tag}) failed: {e}", file=sys.stderr)
        if out:
            print(
                f"# noise_canary_{tag} {canary_q}: min {min(out)} "
                f"max {max(out)} {out}",
                file=sys.stderr,
            )
        return out

    def canary_field(samples_: list[float]):
        return (
            {
                "query": canary_q,
                "samples": samples_,
                "min": min(samples_),
                "max": max(samples_),
            }
            if samples_
            else None
        )

    canary_pre = run_canary("pre")

    times: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    rows: dict[str, int] = {}
    failed: list[str] = []
    total = 0.0
    for name in HEADLINE:
        try:
            # lookup INSIDE the try: a retired/renamed catalog entry not
            # yet reflected in HEADLINE must degrade to one failed row,
            # not a KeyError that kills the JSON line the driver parses
            df = runnable[name](spark, sf_dir)
            runs = []
            for _ in range(2):
                t0 = time.time()
                materialize(df)
                runs.append(round(time.time() - t0, 3))
            n = df.count()  # untimed: row count for the report only
        except Exception as e:
            # one failing query must not swallow every other timing AND
            # the JSON line the driver parses — record the failure and
            # keep going
            times[name] = None
            rows[name] = None
            failed.append(name)
            print(f"# {name}: FAILED {e}", file=sys.stderr)
            continue
        dt = min(runs)
        times[name] = dt
        samples[name] = runs
        rows[name] = n
        total += dt
        print(f"# {name}: {dt:.2f}s {runs} ({n} rows)", file=sys.stderr)

    canary = run_canary("post")

    print(
        json.dumps(
            {
                "metric": "headline_query_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                # per-query RESULT row counts, so cross-round artifacts can
                # normalize throughput and catch a query whose timing
                # "improved" because it silently returned fewer rows
                "rows": rows,
                # non-empty => 'value' sums only the SURVIVORS and must
                # not be read as a speedup against a fully-green round
                "failed": failed,
                # methodology version — bump ONLY when the timing method
                # changes (v2 = noop materialization + min_of_2, frozen
                # since r6); cross-round deltas are meaningful only
                # between artifacts with equal methodology
                "methodology": 2,
                # r6+: full-column evaluation through the noop sink;
                # earlier rounds timed count() (projections pruned) —
                # totals are not comparable across that boundary
                "materialization": "noop",
                # min of two timed materializations per query (noise
                # control for episodic host stalls); both raw samples
                # kept so the variance stays visible
                "timing": "min_of_2",
                "samples": samples,
                # r8+: host-noise context — min/max of 5 repeat
                # materializations of one fixed query; read cross-round
                # total deltas against this spread before calling them
                # regressions (same-code totals have varied 75% on this
                # host). Additive only: timings above are untouched.
                "noise_canary": canary_field(canary),
                # r9+: the same canary run BEFORE the timed loop — a
                # pre/post spread mismatch flags a mid-run load shift
                # inside this one artifact
                "noise_canary_pre": canary_field(canary_pre),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
