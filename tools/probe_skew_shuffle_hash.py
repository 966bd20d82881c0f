"""Skew evidence for the SHUFFLE_HASH-hinted self-joins (r16, VERDICT
r15 item 5): run hamming_pairs and minhash_lsh_pairs over corpora where
one fingerprint/band key dominates (near-identical documents), and
record completion + wall + pair counts. The hazard under test: the
hinted shuffled-hash join builds a per-partition hash table, so a hot
band key concentrates build rows where a broadcast would have
replicated them.

    python tools/probe_skew_shuffle_hash.py [n_docs] [hot_fraction ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from idb_backend_spark.operators import dedup
from idb_backend_spark.session import get_spark


def corpus(spark, n: int, hot: float):
    """n docs; ``hot`` fraction share ONE text (identical simhash
    fingerprint -> identical chunk key in EVERY band -> every band's
    worst case at once); the rest are distinct."""
    n_hot = int(n * hot)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < n_hot,
            F.lit("the quick brown fox jumps over the lazy dog again and again"),
        )
        .otherwise(
            F.concat(
                F.lit("unique document body number "),
                F.col("id").cast("string"),
                F.lit(" with distinct content hash material "),
                F.md5(F.col("id").cast("string")),
            )
        )
        .alias("text"),
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    fracs = [float(x) for x in sys.argv[2:]] or [0.0, 0.1, 0.3]
    spark = get_spark("probe-skew-shj")
    spark.sparkContext.setLogLevel("ERROR")

    for hot in fracs:
        df = corpus(spark, n, hot)
        n_hot = int(n * hot)
        exp_pairs = n_hot * (n_hot - 1) // 2

        spark.sparkContext.setJobDescription(f"skew:simhash:hot={hot}")
        t0 = time.time()
        pairs = dedup.simhash_pairs(
            df, text_col="text", id_col="doc_id", max_hamming=3
        )
        n_pairs = pairs.count()
        t_ham = time.time() - t0

        spark.sparkContext.setJobDescription(f"skew:minhash:hot={hot}")
        t0 = time.time()
        mh = dedup.minhash_lsh_pairs(
            df, text_col="text", id_col="doc_id",
        )
        n_mh = mh.count()
        t_mh = time.time() - t0
        print(
            f"hot={hot} ({n_hot} rows on one key): "
            f"hamming {t_ham:.1f}s {n_pairs} pairs "
            f"(>= {exp_pairs} from the hot key), "
            f"minhash {t_mh:.1f}s {n_mh} pairs",
            flush=True,
        )


if __name__ == "__main__":
    main()
