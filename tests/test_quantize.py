"""Int8 scalar quantization (operators/quantize.py): cross-engine code
parity on edge inputs, recall vs the exact float top-k, plan hygiene —
plus the direct unit test for aggregates.max_watermark (its catalog
entry was retired round 6; the NTZ epoch-ms projection quirk is pinned
here)."""

import duckdb
from pyspark.sql import functions as F

from idb_backend_spark.operators import quantize
from idb_backend_spark.operators.ann import brute_force_topk


# edge vectors the synthetic corpus never contains: all-zero (scale 0),
# empty, NULL, single-element, negative-heavy, exact rounding ties
# (x/scale landing on .5: [2.0, 127.0] -> scale 1.0, 2.5 needs a tie ->
# [2.5, 127.0] gives 2.5/1.0), denormal-ish tiny values
_VECS = [
    [1.0, -2.0, 3.5, 0.0],
    [0.0, 0.0, 0.0, 0.0],
    [],
    None,
    [5.0],
    [-1.0, -127.0, -63.5],
    [2.5, 127.0],
    [-2.5, 127.0],
    [1e-30, 2e-30, -3e-30],
    [0.1, 0.2, 0.30000000000000004],
    [127.0, -127.0, 126.49999999999999],
    [float("nan"), 1.0],
    [1e30, float("inf")],
    [float("-inf")],
]


def test_quantize_codes_match_duckdb(spark):
    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(_VECS)], "id long, v array<double>"
    ).select("id", quantize.quantize_vector("v").alias("q"))
    got = {r["id"]: r["q"] for r in sdf.collect()}

    # literal SQL VALUES, not a registered pandas frame: the pandas
    # bridge coerces float('nan') list elements to NULL, which would
    # feed the two engines DIFFERENT inputs for the poisoned vectors
    # every literal goes through a VARCHAR->DOUBLE cast: a bare numeric
    # literal is parsed as DECIMAL and ROUNDED to its declared scale
    # before the cast (126.49999999999999 arrives as 126.5), which would
    # again diverge the inputs; the string cast parses to the nearest
    # double exactly like Python/Spark
    def _lit(x: float) -> str:
        import math

        if math.isnan(x):
            return "'NaN'::DOUBLE"
        if math.isinf(x):
            return f"'{'-' if x < 0 else ''}Infinity'::DOUBLE"
        return f"'{x!r}'::DOUBLE"

    rows = ", ".join(
        f"({i}, "
        + ("NULL" if v is None else "[" + ", ".join(_lit(x) for x in v) + "]::DOUBLE[]")
        + ")"
        for i, v in enumerate(_VECS)
    )
    con = duckdb.connect()
    con.sql(f"CREATE TABLE t(id BIGINT, v DOUBLE[]); INSERT INTO t VALUES {rows}")
    want = {
        r[0]: (None if r[1] is None else [int(x) for x in r[1]])
        for r in con.sql(
            f"SELECT id, {quantize.quantize_sql('v')} FROM t"
        ).fetchall()
    }
    assert got == want
    # spot-pin the semantics, not just the agreement: max-abs element
    # always codes to +/-127, ties round away from zero on both engines
    assert got[0] == [36, -73, 127, 0]
    assert got[1] == [0, 0, 0, 0]
    assert got[2] == []
    assert got[3] is None
    assert got[4] == [127]
    assert got[6] == [3, 127]  # 2.5 rounds up
    assert got[7] == [-3, 127]  # -2.5 rounds away from zero
    # poisoned vectors (NaN / Infinity anywhere) -> explicit NULL codes
    # on BOTH engines, never a silent all-zero (Spark's NaN->int cast)
    # or a NaN-carrying code list (DuckDB without the guard)
    assert got[11] is None and got[12] is None and got[13] is None


def test_quantized_topk_recall_vs_exact(spark, sf_dir):
    """SQ8's whole error budget is the quantizer; pin its recall against
    the exact float top-k on the shipped corpus (measured: 1.0 at
    sf0.001, 0.9 at sf0.01 and sf0.1 — the demo embeddings are
    well-spread, the worst case for any approximate scorer)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qdf = emb.select(
        "vec_id", quantize.quantize_vector("embedding").alias("qvec")
    )
    q0 = qdf.filter(F.col("vec_id") == 0).select("qvec").first()[0]
    approx = {
        r["vec_id"]
        for r in quantize.quantized_topk(qdf, q0, k=10).collect()
    }
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    exact = {
        r["vec_id"]
        for r in brute_force_topk(emb, qvec, k=10).collect()
    }
    assert len(approx & exact) >= 8


def test_quantize_stays_native(spark, sf_dir):
    """The whole quantize+score path must be JVM-native (no Python eval
    nodes) and keep brute_force_topk's shape: TakeOrderedAndProject, no
    shuffle of the corpus."""
    import contextlib
    import io

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qdf = quantize.quantize_embeddings(emb)
    df = quantize.quantized_topk(qdf, [0] * 64)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    text = buf.getvalue()
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    assert "TakeOrderedAndProject" in text
    assert "Exchange" not in text


def test_quantize_scale_reconstructs(spark):
    """q * scale must reconstruct within scale/2 per element (the int8
    rounding bound) — the contract dequantizing consumers rely on."""
    vecs = [[1.0, -2.0, 3.5, 0.125], [-1.0, -127.0, -63.5], [5.0]]
    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, v array<double>"
    )
    rows = quantize.quantize_embeddings(sdf, "v").collect()
    for r in rows:
        scale = r["qvec_scale"]
        for x, q in zip(r["v"], r["qvec"]):
            assert abs(x - q * scale) <= scale / 2 + 1e-12


def test_max_watermark_operator(spark, sf_dir):
    """A5 (catalog entry retired round 6): grouped max watermark, with
    the epoch-ms projection for TIMESTAMP_NTZ — timestampdiff from the
    NTZ epoch, because unix_micros fails on NTZ and an LTZ cast drags
    the session timezone in."""
    from idb_backend_spark.operators import aggregates as agg
    from idb_backend_spark.plans.registry import _t

    ev = _t(spark, sf_dir, "events")
    wm = agg.max_watermark(ev, "ts", by=["event_type"]).select(
        "event_type",
        F.expr(
            "timestampdiff(MILLISECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', watermark)"
        ).alias("watermark_ms"),
    )
    got = {r["event_type"]: r["watermark_ms"] for r in wm.collect()}
    want = {
        r[0]: r[1]
        for r in duckdb.sql(
            "SELECT event_type, epoch_ms(max(ts)) FROM "
            f"'{sf_dir}/events.parquet' GROUP BY event_type"
        ).fetchall()
    }
    assert got == want and len(got) > 0

    # global (no keys) form agrees with the max over the per-type rows
    g = agg.max_watermark(ev, "ts").collect()
    per_type = agg.max_watermark(ev, "ts", by=["event_type"]).collect()
    assert len(g) == 1
    assert g[0]["watermark"] == max(r["watermark"] for r in per_type)


def test_unique_values_scientificname_capitalize_fold(spark):
    """A3 quirk pin (download.py:189-190): values of a field whose
    lowercased name ends with 'scientificname' are str.capitalize()d
    BEFORE counting — case variants merge into one bucket and the
    rendered value is the folded form; other fields count raw. Expected
    values computed with Python's own str.capitalize."""
    from idb_backend_spark.operators import aggregates as agg

    vals = [
        "acer rubrum",
        "ACER RUBRUM",
        "Acer Rubrum",
        "acer rubrum",
        "3-leaf MAPLE",
        None,
    ]
    df = spark.createDataFrame(
        [(v,) for v in vals], "`dwc:scientificName` string"
    )
    got = {
        (r["value"], r["count"])
        for r in agg.unique_values(df, "`dwc:scientificName`").collect()
    }
    import collections

    c = collections.Counter(
        v.capitalize() if v is not None else "" for v in vals
    )
    assert got == {(k, n) for k, n in c.items()}
    assert ("Acer rubrum", 4) in got  # the three variants merged

    # a non-scientificname field keeps raw values
    raw = spark.createDataFrame([(v,) for v in vals], "p_brand string")
    got_raw = {
        (r["value"], r["count"])
        for r in agg.unique_values(raw, "p_brand").collect()
    }
    c_raw = collections.Counter(v if v is not None else "" for v in vals)
    assert got_raw == {(k, n) for k, n in c_raw.items()}


def test_usage_stats_rollup_matches_reference_accumulation(spark):
    """A7 three-branch pin: usage_stats_rollup equals a transcription of
    collect_stats' accumulation loops (collect.py:132-166) over rows
    exercising every branch — view (items, no queries), seen (items AND
    queries), search (payload flipped: record_count weights, no
    items)."""
    import collections

    from idb_backend_spark.operators import aggregates as agg

    # (stats_type, term, query_hash, geocode, record_count) — one row
    # per exploded payload entry, all in one group
    rows = [
        ("view", "r1", "qa", '{"c":1}', 1),
        ("view", "r1", "qb", '{"c":1}', 1),
        ("view", "r2", "qa", '{"c":2}', 1),
        ("seen", "r1", "qa", '{"c":1}', 1),
        ("seen", "r3", "qa", '{"c":2}', 1),
        ("search", "rs1", "qa", '{"c":1}', 7),
        ("search", "rs1", "qb", '{"c":1}', 2),
    ]

    # reference transcription (per stats_type group here; the reference
    # groups per recordset, same arithmetic)
    ref = collections.defaultdict(
        lambda: {
            "count": 0, "total": 0,
            "items": collections.Counter(),
            "queries": collections.Counter(),
            "geocodes": collections.Counter(),
        }
    )
    for st, term, qh, geo, rcount in rows:
        # the reference canonicalizes via json.dumps(..., sort_keys=True)
        # BEFORE keying (collect.py:136); the operator documents that
        # keys arrive pre-canonicalized, so the transcription keys on
        # the same already-canonical string the engine receives
        geocode = geo
        g = ref[st]
        if st == "view":
            g["count"] += 1
            g["total"] += 1
            g["items"][term] += 1
            g["geocodes"][geocode] += 1
        elif st == "seen":
            g["count"] += 1
            g["total"] += 1
            g["items"][term] += 1
            g["queries"][qh] += 1
            g["geocodes"][geocode] += 1
        else:
            g["count"] += 1
            g["total"] += rcount
            g["queries"][qh] += rcount
            g["geocodes"][geocode] += rcount

    df = spark.createDataFrame(
        rows,
        "stats_type string, term string, query_hash string, "
        "geocode string, record_count long",
    )
    got = {
        r["stats_type"]: r
        for r in agg.usage_stats_rollup(df, ["stats_type"]).collect()
    }
    for st, want in ref.items():
        r = got[st]
        assert r["count"] == want["count"], st
        assert r["total"] == want["total"], st
        assert dict(r["items"] or {}) == dict(want["items"]), st
        assert dict(r["queries"] or {}) == dict(want["queries"]), st
        assert dict(r["geocodes"] or {}) == dict(want["geocodes"]), st
    # the view branch must NOT have a queries map entry for qa/qb
    assert dict(got["view"]["queries"] or {}) == {}
    # the search branch must NOT have items
    assert dict(got["search"]["items"] or {}) == {}
