"""Int8 scalar quantization for embedding columns (SQ8 tier).

At 100 TB the embedding column IS the dataset: a 64-dim float32 vector
is 256 bytes per row, and every ANN scan, shuffle, and cache is bound by
those bytes. Symmetric per-vector int8 quantization cuts that 4x with a
single native projection — no UDF, no shuffle, one pass — the standard
memory/IO tier below IVF in a vector-search stack (FAISS calls it SQ8).
The reference has no vector tier; this extends the training-pipeline
operator set alongside operators/ann.py.

Cross-engine determinism (the driver gate hashes values):
  * scale = max(|x|)/127 and q_i = round(x_i / scale) are computed in
    DOUBLE. Spark's round (BigDecimal HALF_UP) and DuckDB's round
    (C std::round) both take halves away from zero, so the quantized
    codes agree bit-for-bit; `quantize_sql` below is the one SQL twin.
  * Quantized cosine runs on EXACT integers: |q_i| <= 127, so every
    product is <= 16129 and partial sums stay exactly representable in
    a double up to ~2^38 elements — summation ORDER cannot change the
    result, unlike float cosine (which the repo rounds to 6 dp for hash
    stability). The scale factor cancels out of cosine entirely, so
    codes alone score the search; scales matter only for reconstruction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from idb_backend_spark.functions.similarity import cosine_similarity

#: symmetric int8 code range. 127 (not 128) so the range is symmetric
#: and q = round(x/scale) can never overflow: |x| <= max|x| implies
#: |x/scale| <= 127 + ulp noise, which rounds back to 127.
QMAX = 127


def quantize_vector(vec) -> F.Column:
    """array<float/double> -> array<int> int8 codes, max-abs symmetric.

    An all-zero (or empty) vector has scale 0; its codes are defined as
    all-zero rather than NULL/NaN so downstream integer kernels never
    see a poisoned row. NULL input stays NULL. A vector containing a
    NaN or +/-Infinity element quantizes to NULL codes EXPLICITLY —
    without the guard Spark's non-ANSI NaN->int cast would silently
    code the whole vector as zeros while the DuckDB twin kept NaNs,
    the exact silent-divergence class commit f004d8c guards against in
    the functions layer (both engines sort NaN as greatest, so max-abs
    of a poisoned vector is non-finite on both).
    """
    vec = F.col(vec) if isinstance(vec, str) else vec
    v = F.transform(vec, lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, F.abs))
    scale = maxabs / F.lit(float(QMAX))
    q = F.transform(v, lambda x: F.round(x / scale, 0).cast("int"))
    zeros = F.transform(v, lambda x: F.lit(0))
    poisoned = F.isnan(maxabs) | (maxabs == F.lit(float("inf")))
    return (
        F.when(poisoned, F.lit(None).cast("array<int>"))
        .when(maxabs == F.lit(0.0), zeros)
        .otherwise(q)
    )


def quantize_scale(vec) -> F.Column:
    """The per-vector dequantization scale (x ~ q * scale) — store it
    next to the codes when reconstruction or dot products against
    UN-quantized queries are needed; cosine between two code arrays
    does not need it (scales cancel)."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    v = F.transform(vec, lambda x: x.cast("double"))
    return F.array_max(F.transform(v, F.abs)) / F.lit(float(QMAX))


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "qvec"
) -> DataFrame:
    """Add int8 codes (+ `<out_col>_scale`) for ``vec_col`` — one native
    projection; write the result partitioned/bucketed exactly as the
    float table was and drop the float column to realize the 4x."""
    return df.withColumns(
        {
            out_col: quantize_vector(vec_col),
            f"{out_col}_scale": quantize_scale(vec_col),
        }
    )


def quantized_topk(
    df: DataFrame,
    query_codes,
    qvec_col: str = "qvec",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Cosine top-k over int8 code arrays against a quantized query.

    Same plan shape as ann.brute_force_topk (scan + TakeOrderedAndProject,
    no shuffle of the corpus) but the scan reads 4x fewer bytes and the
    arithmetic is exact-integer — the approximation lives entirely in the
    quantization step, whose recall the unit tests pin against the exact
    float top-k.
    """
    qlit = F.array(*[F.lit(int(x)) for x in query_codes])
    sim = cosine_similarity(F.col(qvec_col), qlit)
    return (
        df.select(F.col(id_col), F.round(sim, 6).alias("cosine_q"))
        .orderBy(F.desc("cosine_q"), F.col(id_col))
        .limit(k)
    )


def quantize_sql(vec_expr: str) -> str:
    """DuckDB twin of `quantize_vector` — the ONE rendering of the code
    range and rounding into oracle SQL, so the gate's replica cannot
    drift from the engine (pattern: functions/text.analyzer_contains_sql).

    Emits a scalar expression over ``vec_expr`` (a float-list column);
    the maxabs subexpression is inlined in every branch, which DuckDB
    CSE-folds.
    """
    v = f"list_transform({vec_expr}, x -> CAST(x AS DOUBLE))"
    maxabs = f"list_max(list_transform({v}, x -> abs(x)))"
    scale = f"({maxabs} / {float(QMAX)})"
    return (
        f"CASE WHEN NOT isfinite({maxabs}) THEN NULL "
        f"WHEN {maxabs} = 0 THEN list_transform({v}, x -> 0.0) "
        f"ELSE list_transform({v}, x -> round(x / {scale})) END"
    )
