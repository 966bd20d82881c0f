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


# (The array-expression minhash trio — hash_base / minhash_signature /
# lsh_band_keys — was removed: nothing called it since the aggregation
# formulation in operators.dedup.minhash_signatures replaced it, and its
# nested 64-lane expressions fall out of codegen ~20x slower. The
# aggregation path is the one that survives 100 TB.)


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

    # The per-byte Python FNV loop is the dominant cost; natural-language
    # batches repeat tokens heavily (stopwords, shingle overlap), so hash
    # each DISTINCT token once per Arrow batch and look the rest up —
    # identical fingerprints (same hash family, bit-exact), typically an
    # order of magnitude fewer Python-level hash computations. The
    # per-doc bit math stays vectorized numpy.
    hash_cache: dict[str, int] = {}

    def tok_hash(t: str) -> int:
        h = hash_cache.get(t)
        if h is None:
            h = fnv1a64(t)
            hash_cache[t] = h
        return h

    out = []
    bit_idx = np.arange(64, dtype=np.uint64)
    pow2 = (np.uint64(1) << bit_idx).astype(np.uint64)
    for toks in tokens:
        if toks is None or len(toks) == 0:
            out.append(0)
            continue
        hs = np.fromiter((tok_hash(t) for t in toks), dtype=np.uint64)
        bits = (hs[:, None] >> bit_idx[None, :]) & np.uint64(1)
        counts = bits.sum(axis=0).astype(np.int64)
        sign = counts * 2 > len(hs)
        # assemble the fingerprint as one vectorized dot, not a 64-step
        # Python bit loop
        val = int((pow2 * sign.astype(np.uint64)).sum())
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
