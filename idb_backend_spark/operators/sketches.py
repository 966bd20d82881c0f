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
