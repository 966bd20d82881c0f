"""Deterministic dataset splitting — the train/val/test assignment step
of a training-data pipeline.

`randomSplit` is seed- and partitioning-dependent: re-running it after a
repartition (or on a grown corpus) reassigns rows, silently leaking
yesterday's training docs into today's eval set. The correct primitive
at 100 TB is a pure function of the ROW KEY: the assignment is stable
under reruns, appends, repartitioning, and engine changes — and
auditable from SQL (md5 is identical in Spark, DuckDB, Postgres, …).

No counterpart in the reference (it has no ML-split concept); part of
the training-data-pipeline extension tier alongside operators/dedup.py
and operators/ann.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_cut(fraction: float) -> int:
    """The shared cut-point for every md5-prefix keep decision in this
    module: ``int(round(256 * fraction))``, compared against the first
    two hex chars of ``md5(key)``. Exposed as ONE function so the Spark
    expressions here and the DuckDB oracle builders (plans/synth.py)
    round identically — a hand-copied ``round`` on one side is exactly
    the class of silent drift the shared-builder rule exists to prevent.
    ``<= 0`` means keep nothing; ``>= 256`` means keep everything;
    otherwise compare ``substr(md5(key), 1, 2) < format(cut, '02x')``.
    """
    return int(round(256 * fraction))


def split_assignment(
    key: Column | str,
    weights: tuple[float, ...] = (0.8, 0.1),
    labels: tuple[str, ...] = ("train", "val", "test"),
) -> Column:
    """Label expression assigning each key to a split bucket.

    The first two hex chars of ``md5(key)`` give a uniform value in
    0..255; cumulative-weight cut points become hex-string thresholds so
    the whole assignment is ONE native expression (and the same
    comparison is expressible verbatim in any SQL engine for audit).
    ``weights`` are the first ``len(labels)-1`` fractions; the remainder
    is the final label. Granularity is 1/256 — cut points round to it,
    and a cut that rounds past either end of the byte range becomes an
    always/never branch instead of a malformed 3-char hex literal (the
    2-char md5 prefix compares lexicographically, so '100' would match
    almost nothing — measured 7% instead of 99.9% before this guard).
    """
    if len(weights) != len(labels) - 1:
        raise ValueError("need exactly one weight per non-final label")
    if any(w <= 0.0 for w in weights):
        # a negative weight passes the sum check but makes the cut
        # points non-monotonic: the when-chain's later branch becomes
        # unreachable and its split silently receives ZERO rows — in
        # the module whose whole point is audit-safe splitting, refuse
        raise ValueError(f"weights must all be > 0, got {weights}")
    if sum(weights) >= 1.0:
        raise ValueError("weights must sum to < 1 (remainder = final label)")
    k = F.col(key) if isinstance(key, str) else key
    h = F.substring(F.md5(k.cast("string")), 1, 2)
    expr = None
    acc = 0.0
    for w, label in zip(weights, labels[:-1]):
        acc += w
        cut_int = md5_cut(acc)
        if cut_int >= 256:
            branch = F.lit(True)  # cumulative weight ~1: label everything
        elif cut_int <= 0:
            branch = F.lit(False)  # below 1/512: this label gets no rows
        else:
            branch = h < F.lit(f"{cut_int:02x}")
        expr = (
            F.when(branch, label)
            if expr is None
            else expr.when(branch, label)
        )
    return expr.otherwise(labels[-1])


def deterministic_split(
    df: DataFrame,
    key_col: str,
    weights: tuple[float, ...] = (0.8, 0.1),
    labels: tuple[str, ...] = ("train", "val", "test"),
    out_col: str = "split",
) -> DataFrame:
    """Attach the stable split label; a narrow projection — no shuffle,
    no sampling state, safe to recompute anywhere."""
    return df.withColumn(
        out_col, split_assignment(key_col, weights, labels)
    )


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float
) -> DataFrame:
    """Keep a stable ~``fraction`` of rows as a pure function of the row
    key (md5-prefix threshold, granularity 1/256) — the sampling twin of
    `deterministic_split`: re-runs, appends, and repartitioning keep the
    SAME rows, unlike `DataFrame.sample`'s seed+partition dependence.
    """
    if not 0.0 < fraction < 1.0:
        raise ValueError(f"fraction must be in (0, 1), got {fraction}")
    cut_int = md5_cut(fraction)
    if cut_int <= 0:
        # below the 1/512 rounding floor the filter would silently keep
        # NOTHING — refuse loudly instead
        raise ValueError(
            f"fraction {fraction} is below the 1/256 md5-prefix "
            "granularity (rounds to an empty sample)"
        )
    k = F.col(key_col)
    if cut_int >= 256:
        # fraction ~1 rounds to the whole byte range: keep every row
        # (a 3-char '100' literal would lexicographically keep ~6%)
        return df
    return df.filter(
        F.substring(F.md5(k.cast("string")), 1, 2) < f"{cut_int:02x}"
    )


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic domain-mixture sampling — the corpus-mixing step of
    a training-data pipeline: keep a per-domain fraction of rows (e.g.
    web 10%, books 100%, code 50%) as a pure function of the row key.

    One native CASE expression over the md5-prefix threshold (same
    1/256-granularity primitive as `deterministic_sample`), so the
    mixture is stable under reruns, appends, and repartitioning, and
    the whole filter pushes into the scan — no shuffle, no sampling
    state, auditable from SQL. Domains absent from ``fractions`` keep
    ``default_fraction`` (0 = drop unknown domains; 1 = keep them).
    """
    for d, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for domain {d!r} not in [0, 1]: {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction not in [0, 1]: {default_fraction}")

    h = F.substring(F.md5(F.col(key_col).cast("string")), 1, 2)

    def keep_expr(fraction: float) -> Column:
        cut = md5_cut(fraction)
        if cut >= 256:
            return F.lit(True)
        if cut <= 0:
            return F.lit(False)
        return h < F.lit(f"{cut:02x}")

    pred = None
    for d, f in fractions.items():
        branch = (F.col(domain_col) == F.lit(d)) & keep_expr(f)
        pred = branch if pred is None else (pred | branch)
    # a NULL domain is an unknown domain (isin yields NULL there, and a
    # bare ~NULL would silently drop null-domain rows from the default
    # bucket instead of applying default_fraction)
    unknown = (
        F.coalesce(~F.col(domain_col).isin(*fractions), F.lit(True))
        if fractions
        else F.lit(True)
    )
    other = unknown & keep_expr(default_fraction)
    pred = other if pred is None else (pred | other)
    return df.filter(pred)


def cap_per_domain(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    cap: int,
    n_salts: int = 16,
) -> DataFrame:
    """Hard per-domain cap — the "max documents per host" rule of
    web-corpus pipelines (per-domain FRACTIONS are `mixture_sample`;
    this is the absolute ceiling that no hot domain may exceed): keep
    at most ``cap`` rows per domain, chosen by deterministic md5
    priority of the row key, so the kept set is stable under reruns
    and repartitioning (appends can displace rows only at the cap
    boundary — the hash order is global, not arrival order).

    Skew is the whole problem at scale — domain caps exist BECAUSE a
    few domains dominate — so a single window partitioned by domain
    (one straggler task per hot domain) is the wrong plan. Two-level
    rank instead, the `operators/skew.salted_count` shape: rank within
    (domain, salt) where salt = hash(key) mod n_salts and keep the
    per-lane top-``cap``; the global top-``cap`` is a subset of the
    union of per-lane top-``cap``s, so re-ranking the survivors —
    bounded by n_salts x cap per domain, whatever the domain's true
    size — gives exactly the single-window answer. Both levels order
    by (md5(key), key): the raw-key tiebreak keeps duplicate hashes
    deterministic.

    A NULL domain is a domain (capped like any other — dropping
    null-domain rows silently is how undeclared hosts sneak past the
    ceiling); a NULL key hashes to NULL and sorts first (Spark's ASC
    default is NULLS FIRST; the twin pins NULLS FIRST explicitly —
    DuckDB's ASC default is NULLS LAST).

    Determinism contract: the kept SET is stable only when ``key_col``
    is row-unique within each domain (a doc id — the same caller
    contract as every md5-keyed op here). Rows tied on the full sort
    key (duplicate key values, or several NULL keys in one domain) get
    arbitrary relative row_numbers, so WHICH of the tied rows survives
    at the cap boundary is partitioning-dependent — on both engines;
    the count per domain is exact regardless.
    """
    from pyspark.sql import Window

    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    k = F.col(key_col)
    pri = F.md5(k.cast("string"))
    salt = F.pmod(F.xxhash64(k.cast("string")), F.lit(int(n_salts)))
    lane = Window.partitionBy(F.col(domain_col), salt).orderBy(
        pri.asc(), k.asc()
    )
    survivors = df.withColumn("__rn", F.row_number().over(lane)).filter(
        F.col("__rn") <= cap
    )
    final = Window.partitionBy(domain_col).orderBy(pri.asc(), k.asc())
    return (
        survivors.withColumn("__rn", F.row_number().over(final))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def cap_per_domain_sql(
    table: str, domain_col: str, key_col: str, cap: int
) -> str:
    """DuckDB twin of ``cap_per_domain`` — the plain single-window
    formulation (the two-level rank is a physical rewrite with an
    identical result set; the twin states the SEMANTICS). Kept here so
    the priority expression lives next to the engine's (pattern:
    lm.bigram_lm_score_sql)."""
    return (
        f"SELECT * EXCLUDE (rn) FROM (SELECT *, row_number() OVER ("
        f"PARTITION BY {domain_col} "
        f"ORDER BY md5(CAST({key_col} AS VARCHAR)) NULLS FIRST, "
        f"{key_col} NULLS FIRST) AS rn "
        f"FROM {table}) WHERE rn <= {int(cap)}"
    )


def epoch_shuffle_key(key: Column | str, epoch: int) -> Column:
    """Pseudo-random sort key for epoch ``epoch`` as a pure function of
    the row key: ``md5(key || ':' || epoch)``. Ordering by it gives each
    training epoch its own deterministic permutation — reproducible
    across reruns, partitionings, and engines (auditable from SQL, like
    every keep/cut decision in this module), unlike orderBy(rand(seed)),
    which is partitioning-dependent. The key must be non-null and
    unique (a doc id): concat_ws skips NULL, so null keys would all
    collapse onto md5(str(epoch)) and sort adjacently instead of
    failing — same caller contract as every md5-keyed op here.
    """
    if epoch < 0:
        raise ValueError(f"epoch must be >= 0, got {epoch}")
    k = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat_ws(":", k.cast("string"), F.lit(str(epoch))))


def epoch_shuffle(df: DataFrame, key_col: str, epoch: int) -> DataFrame:
    """Deterministic epoch shuffle — the data-ordering step of a
    training run: one total-order sort by the epoch's md5 key (a single
    range exchange, which IS the shuffle; there is no cheaper global
    permutation). Writers consuming the result preserve the order into
    sequence files. Different epochs give uncorrelated permutations of
    the SAME row set; re-running an epoch reproduces its order exactly.
    """
    return df.orderBy(epoch_shuffle_key(key_col, epoch), F.col(key_col))
