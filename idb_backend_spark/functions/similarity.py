"""Similarity kernels for near-duplicate detection and ANN search.

Scale-first design notes:
  * MinHash signatures are computed natively: one xxhash64 per shingle,
    then the (a*x + b) mod p universal-hash family is applied with
    `transform`/`array_min` — no Python in the loop, no shuffle until the
    LSH band explode.
  * SimHash is a vectorized Arrow pandas_udf (numpy bit-twiddling) — the
    64 per-bit accumulations are a poor fit for per-element Column
    expressions but are a single matrix op in numpy.
  * Cosine similarity is a native zip_with/aggregate fold — JVM-side,
    deterministic left-to-right summation (reproducible across engines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# Mersenne prime 2^31 - 1: universal hashing modulus. With a, b, x all < p,
# a*x + b < 2^62 — safely inside a signed 64-bit long, so the JVM-side
# modular arithmetic is exact (no silent overflow wrap).
MERSENNE_P = (1 << 31) - 1


def _hash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE_P, size=num_hashes, dtype=np.int64)
    b = rng.randint(0, MERSENNE_P, size=num_hashes, dtype=np.int64)
    return list(zip(a.tolist(), b.tolist()))


def hash_base(shingle_col: Column) -> Column:
    """base_i = xxhash64(shingle_i) mod p — computed ONCE per shingle.

    Keep this in its own projection (select/withColumn boundary) so the
    signature lanes reference an attribute instead of re-evaluating the
    shingle hashing per lane."""
    return F.transform(
        shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE_P))
    )


def minhash_signature(
    shingle_col: Column, num_hashes: int = 64, seed: int = 42
) -> Column:
    """MinHash signature (array<long>, length num_hashes) from a shingle or
    pre-hashed base array, entirely with native expressions.

    base_i = xxhash64(shingle_i) mod p;  sig_j = min_i ((a_j*base_i + b_j) mod p)
    With a, b, base < p < 2^31 the arithmetic is overflow-exact in 64-bit —
    deterministic and portable.

    IMPORTANT at scale: pass ``hash_base(...)`` through its own projection
    boundary (withColumn/select) and call this on the resulting *attribute*;
    inlining the shingle expression here would re-evaluate it once per lane.
    """
    base = shingle_col

    def _perm(a: int, b: int):
        # Single-arg lambda factory (extra default args would be bound to
        # the higher-order function's index parameter). a*x + b < 2^62: exact.
        return lambda x: F.pmod(F.lit(a) * x + F.lit(b), F.lit(MERSENNE_P))

    sigs = [
        F.array_min(F.transform(base, _perm(a, b)))
        for a, b in _hash_params(num_hashes, seed)
    ]
    return F.array(*sigs)


def lsh_band_keys(sig_col: Column, bands: int, rows_per_band: int) -> Column:
    """Split a signature into bands and hash each band -> array<struct
    (band int, key long)>. Explode + groupBy(key) buckets candidate pairs;
    two docs land in the same bucket iff a whole band matches (the standard
    banding amplification of Jaccard similarity)."""
    entries = []
    for bi in range(bands):
        band = F.slice(sig_col, bi * rows_per_band + 1, rows_per_band)
        entries.append(
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(F.concat_ws("_", *[
                    F.element_at(band, j + 1).cast("string")
                    for j in range(rows_per_band)
                ])).alias("key"),
            )
        )
    return F.array(*entries)


@F.pandas_udf(LongType())
def simhash64(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash over a token array column (Arrow-batched numpy).

    For each doc: hash every token to 64 bits; each bit contributes +1/-1
    to its lane; the sign vector is the fingerprint. Near-dups have small
    Hamming distance. Uses a fixed FNV-1a-based token hash so results are
    stable across runs/engines.
    """
    def fnv1a64(s: str) -> int:
        h = 0xCBF29CE484222325
        for ch in s.encode("utf8"):
            h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    out = []
    bit_idx = np.arange(64, dtype=np.uint64)
    for toks in tokens:
        if toks is None or len(toks) == 0:
            out.append(0)
            continue
        hs = np.fromiter((fnv1a64(t) for t in toks), dtype=np.uint64)
        bits = (hs[:, None] >> bit_idx[None, :]) & np.uint64(1)
        counts = bits.sum(axis=0).astype(np.int64)
        sign = counts * 2 > len(hs)
        val = 0
        for i in range(64):
            if sign[i]:
                val |= 1 << i
        # store as signed 64-bit
        out.append(val - (1 << 64) if val >= (1 << 63) else val)
    return pd.Series(out, dtype="int64")


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two signed-64-bit fingerprints, natively."""
    x = a.bitwiseXOR(b)
    return F.bit_count(x)


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns as a native
    zip_with + aggregate fold (deterministic sequential summation)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return F.when((na > 0) & (nb > 0), dot / (na * nb))
