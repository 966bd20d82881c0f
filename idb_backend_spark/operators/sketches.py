"""Sketch audits — certify approximate aggregates against exact ones.

A 100 TB deployment answers cardinality and quantile questions with
sketches (HyperLogLog++ via ``approx_count_distinct``, Greenwald-Khanna
via ``percentile_approx``) because the exact forms shuffle every
distinct value. The audit pattern makes that safe: run BOTH at a scale
where exact is affordable, certify the sketch's error against its
advertised bound, then deploy sketch-only at full scale — the same
exact-oracle-verifies-the-sketch discipline the dedup tier uses
(minhash_exact_verified / simhash_exact_verified grade sketch recall
against exact Jaccard/Hamming).

Both audits are ONE aggregate each — the sketch and the exact measure
ride the same exchange, so the audit costs no extra pass. Outputs carry
the exact value plus a within-bound boolean (never the raw sketch
estimate: it is implementation-defined and no oracle can reproduce it;
a driver gate hashes the boolean CONTRACT instead — cf. the recall
booleans of minhash_exact_verified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_distinct_audit(
    df: DataFrame,
    group_col: str,
    value_col: str,
    rsd: float = 0.05,
    tol_sigmas: float = 4.0,
) -> DataFrame:
    """(group, exact_distinct, within_tol): per-group HLL++ estimate
    audited against exact count-distinct. ``rsd`` is the sketch's
    relative standard deviation (Spark default 0.05); the pass bound is
    ``tol_sigmas`` standard deviations (4σ default — ~6e-5 two-sided
    miss probability per group under the HLL error model, forgiving of
    the heavier small-cardinality tail where HLL++ switches to linear
    counting). Single aggregate: both measures ride one exchange."""
    rel_err = (
        F.abs(
            F.col("__approx").cast("double") - F.col("__exact").cast("double")
        )
        / F.greatest(F.col("__exact").cast("double"), F.lit(1.0))
    )
    return (
        df.groupBy(group_col)
        .agg(
            F.approx_count_distinct(value_col, rsd).alias("__approx"),
            F.countDistinct(value_col).alias("__exact"),
        )
        .select(
            F.col(group_col),
            F.col("__exact").alias("exact_distinct"),
            (rel_err <= F.lit(float(rsd) * float(tol_sigmas))).alias(
                "within_tol"
            ),
        )
    )


def quantile_audit(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    accuracy: int = 10000,
    rel_tol: float = 0.01,
) -> DataFrame:
    """(p, exact_q, within_tol): Greenwald-Khanna approximate quantiles
    audited against exact (interpolated) percentiles. percentile_approx
    guarantees RANK error <= 1/accuracy, which maps to an unknown VALUE
    error — so the pass bound is a value tolerance of ``rel_tol`` of the
    column's range (rank-exactness would over-promise on heavy-tailed
    data where adjacent ranks sit far apart; range-relative is what a
    consumer of the quantile actually experiences). One aggregate: the
    sketch, the exact percentiles, and min/max ride one reduction.
    exact_q is rounded to the repo's 6-dp float contract. An empty or
    all-NULL column yields NO rows (percentile aggregates return NULL,
    the zip explodes to nothing) — there is nothing to audit; the SQL
    twin's unnest of a NULL quantile list produces the same zero
    rows."""
    probs = [float(p) for p in probs]
    row = df.agg(
        F.percentile_approx(value_col, probs, accuracy).alias("approx"),
        F.expr(
            f"percentile({value_col}, array({', '.join(repr(p) for p in probs)}))"
        ).alias("exact"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(p) for p in probs]).alias("p"),
        F.col("approx").cast("array<double>").alias("a"),
        F.col("exact").cast("array<double>").alias("e"),
    )
    exploded = row.select(
        F.explode(pairs).alias("z"),
        (F.col("mx") - F.col("mn")).cast("double").alias("rng"),
    )
    return exploded.select(
        F.col("z.p").alias("p"),
        F.round(F.col("z.e"), 6).alias("exact_q"),
        (
            F.abs(F.col("z.a") - F.col("z.e"))
            <= F.greatest(
                F.col("rng") * F.lit(float(rel_tol)), F.lit(1e-12)
            )
        ).alias("within_tol"),
    )


def hll_distinct_audit_sql(
    table: str, group_col: str, value_col: str
) -> str:
    """DuckDB twin of ``hll_distinct_audit``'s CONTRACT: the exact
    per-group distinct count and an always-TRUE within_tol — a gate
    slot for the audit fails iff the sketch ever leaves its bound."""
    return (
        f"SELECT {group_col}, "
        f"CAST(count(DISTINCT {value_col}) AS BIGINT) AS exact_distinct, "
        f"TRUE AS within_tol FROM {table} GROUP BY {group_col} "
        f"ORDER BY {group_col}"
    )


def quantile_audit_sql(table: str, value_col: str, probs: list[float]) -> str:
    """DuckDB twin of ``quantile_audit``'s contract: exact continuous
    (interpolated) quantiles — quantile_cont matches Spark's
    `percentile` interpolation — and an always-TRUE within_tol. ONE
    list-form aggregate = one table scan (a per-prob scalar subquery
    would scan per prob); an empty/all-NULL column returns a NULL
    quantile list, filtered out BEFORE the unnest so the twin yields
    the engine side's zero rows (DuckDB zip-PADS unequal unnests with
    NULLs — without the filter the probs list would still fabricate
    one (p, NULL, TRUE) row per prob)."""
    plist = ", ".join(repr(float(p)) for p in probs)
    return (
        f"WITH qq AS (SELECT quantile_cont({value_col}, [{plist}]) AS qs "
        f"FROM {table}) "
        # CAST: a bare 0.5 literal is DECIMAL in DuckDB, and the gate
        # hashes '0.5' vs Spark's double differently
        f"SELECT CAST(unnest([{plist}]) AS DOUBLE) AS p, "
        "round(unnest(qs), 6) AS exact_q, TRUE AS within_tol "
        "FROM qq WHERE qs IS NOT NULL ORDER BY p"
    )


def cms_counters(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 8192
) -> DataFrame:
    """(row, col, cnt) Count-Min counters over ``key_col`` — ONE bounded
    aggregation: each input row explodes into ``depth`` (row, bucket)
    pairs (the only row multiplier), map-side combine collapses them to
    at most depth x width counters per task before the single exchange.

    Hashes are the repo's engine-portable md5-prefix family
    (classifier.hashed_bucket), row-salted with 'i:' so the depth rows
    are independent — deterministic across runs, partitionings, and
    engines (unlike a seeded xxhash, a DuckDB twin can reproduce these
    counters bit-for-bit if it ever needs to). NULL keys hash on the
    bare salt (concat_ws skips NULL) — one shared bucket, matching how
    GROUP BY puts all NULLs in one group.
    """
    from idb_backend_spark.operators.classifier import hashed_bucket

    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    pairs = [
        F.struct(
            F.lit(i).alias("row"),
            hashed_bucket(
                F.concat_ws(":", F.lit(str(i)), F.col(key_col).cast("string")),
                width,
            ).alias("col"),
        )
        for i in range(depth)
    ]
    return (
        df.select(F.explode(F.array(*pairs)).alias("rc"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold_count: int,
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """EXACT heavy hitters — (key, n) for every key whose true count
    >= ``threshold_count`` — computed without shuffling the full
    distinct-key space (the reason plain GROUP BY ... HAVING dies on a
    100 TB skewed column).

    Two passes, both bounded:
      1. Count-Min counters (one exchange of <= depth x width rows).
      2. Per-row estimate = min over the depth counters, evaluated
         MAP-SIDE via ``depth`` broadcast joins (the counter frame is
         KB-scale) — rows with est < threshold are dropped before any
         shuffle. Since est >= true count ALWAYS (counters only
         over-count on collisions), no true heavy hitter's rows are
         dropped: the filter has zero false negatives by construction.
         Survivors — the heavy keys plus collision false positives —
         are exactly counted and the HAVING filter re-applied.

    The output is therefore EXACTLY ``GROUP BY key HAVING count >=
    threshold`` (the oracle), while the shuffle carries only counters +
    candidate rows. Width tunes the candidate tail: expected collision
    over-count per row-hash is N/width, so size width >> N/threshold to
    keep false candidates rare (they cost shuffle, never correctness).
    """
    if threshold_count < 1:
        raise ValueError(f"threshold_count must be >= 1, got {threshold_count}")
    from idb_backend_spark.operators.classifier import hashed_bucket

    # the tiny counter frame feeds `depth` broadcast joins — pin it so
    # the counting aggregation runs once, not once per join
    counters = cms_counters(df, key_col, depth, width).localCheckpoint(
        eager=True
    )
    probed = df.select(F.col(key_col))
    ests = []
    for i in range(depth):
        ci = counters.filter(F.col("row") == i).select(
            F.col("col").alias(f"__col{i}"), F.col("cnt").alias(f"__c{i}")
        )
        probed = probed.withColumn(
            f"__col{i}",
            hashed_bucket(
                F.concat_ws(":", F.lit(str(i)), F.col(key_col).cast("string")),
                width,
            ),
        ).join(F.broadcast(ci), f"__col{i}")
        ests.append(F.col(f"__c{i}"))
    est = ests[0] if len(ests) == 1 else F.least(*ests)
    return (
        probed.filter(est >= threshold_count)
        .groupBy(key_col)
        .agg(F.count("*").cast("bigint").alias("n"))
        .filter(F.col("n") >= threshold_count)
    )


def heavy_hitters_sql(table: str, key_col: str, threshold_count: int) -> str:
    """DuckDB twin of ``cms_heavy_hitters`` — the SEMANTICS are plain
    exact GROUP BY ... HAVING (the CMS prefilter is a physical rewrite
    with a zero-false-negative guarantee, not an approximation); a
    grading slot for this entry proves that guarantee row-for-row."""
    return (
        f"SELECT {key_col}, CAST(count(*) AS BIGINT) AS n FROM {table} "
        f"GROUP BY {key_col} HAVING count(*) >= {int(threshold_count)} "
        f"ORDER BY {key_col}"
    )
