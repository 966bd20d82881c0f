"""The engine's demonstration query catalog.

Every operator from SURVEY.md §2 is exercised as a (spark_query,
oracle_sql) pair over the synthetic tables (TESTDATA.md). The Spark side
uses the engine's operator library; the SQL side is independent ANSI SQL
with identical semantics, runnable by DuckDB — the correctness gate.

Column-naming discipline: every computed column is aliased identically on
both sides (the driver hashes values under sorted column names).
Floating-point aggregates are rounded identically on both sides so the
hash comparison is decimal-stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idb_backend_spark.operators import aggregates as agg
from idb_backend_spark.operators import ann, dedup, relations, versioning
from idb_backend_spark.functions import grabbers, text
from idb_backend_spark.query.shim import compile_shim, shim_to_sql

Q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Defensive for driver-owned sessions: nanosecond parquet timestamps are
    # unreadable by Spark unless mapped to long (converted back below).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # integer div (not double: 1.7e18 exceeds double's 53-bit
            # mantissa) nanos -> micros, matching DuckDB's ns->us truncation
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def query(name: str, oracle: str | None = None):
    def deco(fn):
        Q[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn
    return deco


# --------------------------------------------------------------------------
# §2.2 — the iDigBio query format (shim) predicates
# --------------------------------------------------------------------------

_SHIM_TERM = {"c_mktsegment": "BUILDING", "c_nationkey": [1, 5, 9]}


@query(
    "shim_term_terms",
    f"SELECT c_custkey, c_name, c_nationkey FROM customer "
    f"WHERE {shim_to_sql(_SHIM_TERM)} ORDER BY c_custkey",
)
def shim_term_terms(spark, sf_dir):
    """P1/P2/P12 — term + terms + conjunction via the shim compiler."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(compile_shim(_SHIM_TERM))
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
    )


_SHIM_RANGE = {
    "o_totalprice": {"type": "range", "gte": 100000, "lt": 200000},
    "o_orderpriority": {"type": "prefix", "value": "1"},
}


@query(
    "shim_range_prefix",
    f"SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders "
    f"WHERE {shim_to_sql(_SHIM_RANGE)} ORDER BY o_orderkey",
)
def shim_range_prefix(spark, sf_dir):
    """P5/P6 — range + prefix predicates."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(compile_shim(_SHIM_RANGE))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


_SHIM_EXISTS = {
    "props": {"type": "exists"},
    "event_type": ["click", "view"],
    "value": {"gte": 5.0},
}


@query(
    "shim_exists_range",
    f"SELECT event_id, event_type, value FROM events "
    f"WHERE {shim_to_sql(_SHIM_EXISTS)} ORDER BY event_id",
)
def shim_exists_range(spark, sf_dir):
    """P3/P4 — exists/missing combined with terms + range."""
    return (
        _t(spark, sf_dir, "events")
        .filter(compile_shim(_SHIM_EXISTS))
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
    )


_SHIM_FULLTEXT = {"fulltext": {"type": "fulltext", "value": "spark window merge"}}


@query(
    "shim_fulltext",
    "SELECT doc_id FROM (SELECT doc_id, lower(text) AS fulltext FROM documents) "
    f"WHERE {shim_to_sql(_SHIM_FULLTEXT)} ORDER BY doc_id",
)
def shim_fulltext(spark, sf_dir):
    """P7 — fulltext AND-of-tokens over the precomputed fulltext column."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "fulltext", F.lower(F.col("text"))
    )
    return docs.filter(compile_shim(_SHIM_FULLTEXT)).select("doc_id").orderBy("doc_id")


# Geo predicates: the synthetic tables carry no coordinates, so we derive a
# deterministic geopoint per customer (integer arithmetic — exact in both
# engines) and filter it with the shim geo predicates.
_GEO_LAT = "CAST((c_custkey * 7) % 160 - 80 AS DOUBLE) + 0.5"
_GEO_LON = "CAST((c_custkey * 13) % 360 - 180 AS DOUBLE) + 0.5"

_SHIM_BBOX = {
    "geopoint": {
        "type": "geo_bounding_box",
        "top_left": {"lat": 40.0, "lon": -100.0},
        "bottom_right": {"lat": 10.0, "lon": -60.0},
    }
}


@query(
    "shim_geo_bounding_box",
    "SELECT c_custkey, lat, lon FROM (SELECT c_custkey, "
    f"{_GEO_LAT} AS lat, {_GEO_LON} AS lon FROM customer) g "
    "WHERE (lat <= 40.0 AND lat >= 10.0) AND (lon >= -100.0 AND lon <= -60.0) "
    "ORDER BY c_custkey",
)
def shim_geo_bbox(spark, sf_dir):
    """P8 — geo_bounding_box over the engine's geopoint struct."""
    g = (
        _t(spark, sf_dir, "customer")
        .withColumn("lat", F.expr(_GEO_LAT))
        .withColumn("lon", F.expr(_GEO_LON))
        .withColumn("geopoint", F.struct(F.col("lat"), F.col("lon")))
    )
    return (
        g.filter(compile_shim(_SHIM_BBOX))
        .select("c_custkey", "lat", "lon")
        .orderBy("c_custkey")
    )


_SHIM_GEODIST = {
    "geopoint": {"type": "geo_distance", "lat": 29.65, "lon": -82.32,
                 "distance": "2000km"}
}


@query(
    "shim_geo_distance",
    "SELECT c_custkey, round(2 * 6371.0088 * asin(sqrt("
    "pow(sin(radians(lat - (29.65)) / 2), 2)"
    " + cos(radians(29.65)) * cos(radians(lat))"
    " * pow(sin(radians(lon - (-82.32)) / 2), 2))), 1) AS dist_km "
    "FROM (SELECT c_custkey, "
    f"{_GEO_LAT} AS lat, {_GEO_LON} AS lon FROM customer) g "
    "WHERE 2 * 6371.0088 * asin(sqrt(pow(sin(radians(lat - (29.65)) / 2), 2)"
    " + cos(radians(29.65)) * cos(radians(lat))"
    " * pow(sin(radians(lon - (-82.32)) / 2), 2))) <= 2000 "
    "ORDER BY c_custkey",
)
def shim_geo_distance(spark, sf_dir):
    """P9 — geo_distance (haversine, native expression)."""
    from idb_backend_spark.query.shim import haversine_km

    g = (
        _t(spark, sf_dir, "customer")
        .withColumn("lat", F.expr(_GEO_LAT))
        .withColumn("lon", F.expr(_GEO_LON))
        .withColumn("geopoint", F.struct(F.col("lat"), F.col("lon")))
    )
    dist = haversine_km(
        F.col("lat"), F.col("lon"), F.lit(29.65), F.lit(-82.32)
    )
    return (
        g.filter(compile_shim(_SHIM_GEODIST))
        .select("c_custkey", F.round(dist, 1).alias("dist_km"))
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# §2.3 joins / §2.5 windows / §2.7 set ops
# --------------------------------------------------------------------------


@query(
    "latest_version_per_key",
    "SELECT user_id, event_id, event_type FROM ("
    "  SELECT user_id, event_id, event_type,"
    "         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn"
    "  FROM events) WHERE rn = 1 ORDER BY user_id",
)
def latest_version_per_key(spark, sf_dir):
    """J1/W1 — LATERAL top-1-per-key (latest event per user)."""
    ev = _t(spark, sf_dir, "events")
    out = versioning.latest_per_key(
        ev, ["user_id"], [F.desc("ts"), F.desc("event_id")]
    )
    return out.select("user_id", "event_id", "event_type").orderBy("user_id")


@query(
    "version_numbering",
    "SELECT event_id, user_id, "
    "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS version "
    "FROM events ORDER BY event_id",
)
def version_numbering(spark, sf_dir):
    """W2 — monotonically increasing version per key."""
    ev = _t(spark, sf_dir, "events")
    out = versioning.with_version_numbers(
        ev, ["user_id"], [F.asc("ts"), F.asc("event_id")]
    )
    return out.select("event_id", "user_id", "version").orderBy("event_id")


@query(
    "identifier_aggregation",
    "SELECT c.c_custkey, count(o.o_orderkey) AS n_ids, "
    "coalesce(min(o.o_orderkey), -1) AS first_id "
    "FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
    "GROUP BY c.c_custkey ORDER BY c.c_custkey",
)
def identifier_aggregation(spark, sf_dir):
    """J2 — per-entity identifier aggregation (array_agg shape, projected to
    count+min for hash-stable comparison)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    agg_df = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count("o_orderkey").alias("n_ids"),
        F.min("o_orderkey").alias("first_id"),
    )
    return (
        cust.join(agg_df, "c_custkey", "left")
        .select(
            "c_custkey",
            F.coalesce("n_ids", F.lit(0)).alias("n_ids"),
            F.coalesce("first_id", F.lit(-1)).alias("first_id"),
        )
        .orderBy("c_custkey")
    )


@query(
    "sibling_symmetrize",
    "WITH edges AS (SELECT DISTINCT l_orderkey AS r1, l_partkey AS r2 FROM lineitem), "
    "sym AS (SELECT r1 AS src, r2 AS dst FROM edges "
    "        UNION ALL SELECT r2, r1 FROM edges) "
    "SELECT src, count(DISTINCT dst) AS n_siblings FROM sym "
    "GROUP BY src ORDER BY src",
)
def sibling_symmetrize(spark, sf_dir):
    """J3/U1 — undirected edge symmetrization + per-node degree."""
    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_orderkey").alias("r1"), F.col("l_partkey").alias("r2")
    ).distinct()
    sym = relations.symmetrize_edges(edges)
    return (
        sym.groupBy("src")
        .agg(F.countDistinct("dst").alias("n_siblings"))
        .orderBy("src")
    )


@query(
    "crossfilter_semi_join",
    "SELECT o_orderkey, o_totalprice FROM orders o "
    "WHERE o.o_orderstatus = 'O' AND EXISTS ("
    "  SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey"
    "  AND l.l_returnflag = 'N' AND l.l_quantity >= 45) "
    "ORDER BY o_orderkey",
)
def crossfilter_semi_join(spark, sf_dir):
    """J5 — has_child cross-filter as a left-semi join."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    r_out, _ = relations.cross_filter(
        orders,
        li,
        record_pred=F.col("o_orderstatus") == "O",
        media_pred=(F.col("l_returnflag") == "N") & (F.col("l_quantity") >= 45),
        link=("o_orderkey", "l_orderkey"),
    )
    return r_out.select("o_orderkey", "o_totalprice").orderBy("o_orderkey")


@query(
    "anti_join_deletes",
    "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS ("
    "  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) "
    "ORDER BY c_custkey",
)
def anti_join_deletes(spark, sf_dir):
    """U2 — delete detection: entities absent from the incoming batch."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    gone = cust.join(orders.distinct(), "c_custkey", "left_anti")
    return gone.select("c_custkey", "c_name").orderBy("c_custkey")


@query(
    "latest_object_per_url",
    "SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber FROM ("
    "  SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,"
    "         row_number() OVER (PARTITION BY l_partkey, l_suppkey"
    "           ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn"
    "  FROM lineitem) WHERE rn = 1 ORDER BY l_partkey, l_suppkey",
)
def latest_object_per_url(spark, sf_dir):
    """J6 — DISTINCT ON (url) ... ORDER BY modified DESC pattern."""
    li = _t(spark, sf_dir, "lineitem")
    out = versioning.latest_per_key(
        li,
        ["l_partkey", "l_suppkey"],
        [F.desc("l_shipdate"), F.desc("l_orderkey"), F.desc("l_linenumber")],
    )
    return out.select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"
    ).orderBy("l_partkey", "l_suppkey")


@query(
    "reconcile_etag_diff",
    "WITH idx AS (SELECT o_orderkey AS id, o_orderstatus AS etag FROM orders"
    "             WHERE o_orderkey % 3 != 0), "
    "store AS (SELECT o_orderkey AS id, "
    "          CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS etag"
    "          FROM orders) "
    "SELECT coalesce(idx.id, store.id) AS id FROM idx FULL OUTER JOIN store"
    " ON idx.id = store.id "
    "WHERE idx.etag IS NULL OR store.etag IS NULL OR idx.etag != store.etag "
    "ORDER BY id",
)
def reconcile_etag_diff(spark, sf_dir):
    """U3 — resume reconciliation: full-outer etag mismatch set."""
    orders = _t(spark, sf_dir, "orders")
    idx = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("id"), F.col("o_orderstatus").alias("etag")
    )
    store = orders.select(
        F.col("o_orderkey").alias("id"),
        F.when(F.col("o_orderkey") % 5 == 0, "X")
        .otherwise(F.col("o_orderstatus"))
        .alias("etag"),
    )
    out = versioning.reconcile_skip_set(idx, store, key="id")
    return out.orderBy("id")


# --------------------------------------------------------------------------
# §2.4 aggregations / §2.6 sorts
# --------------------------------------------------------------------------


@query(
    "citation_counts",
    "SELECT o_custkey AS recordset, count(*) AS count FROM orders "
    "WHERE o_totalprice >= 150000 GROUP BY o_custkey "
    "ORDER BY count DESC, recordset",
)
def citation_counts(spark, sf_dir):
    """A1/S11/O3 — per-recordset hit counts, desc (citation file shape)."""
    orders = _t(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "recordset"
    )
    return agg.hit_counts(orders, F.col("o_totalprice") >= 150000, "recordset")


@query(
    "total_count",
    "SELECT count(*) AS total FROM lineitem "
    "WHERE lower(l_returnflag) = 'r' AND l_quantity >= 25",
)
def total_count(spark, sf_dir):
    """A2 — filtered total count via the shim compiler."""
    li = _t(spark, sf_dir, "lineitem")
    pred = compile_shim({"l_returnflag": "R", "l_quantity": {"gte": 25}})
    return li.filter(pred).agg(F.count(F.lit(1)).alias("total"))


@query(
    "unique_values_counts",
    "SELECT coalesce(CAST(p_brand AS VARCHAR), '') AS value, count(*) AS count "
    "FROM part GROUP BY 1 ORDER BY count DESC, value",
)
def unique_values_counts(spark, sf_dir):
    """A3 — uniquevals export: value histogram desc with empty-string
    null bucket."""
    return agg.unique_values(_t(spark, sf_dir, "part"), "p_brand")


@query(
    "max_watermark",
    "SELECT event_type, epoch_ms(max(ts)) AS watermark_ms FROM events "
    "GROUP BY event_type ORDER BY event_type",
)
def max_watermark(spark, sf_dir):
    """A5 — incremental watermark per type (epoch-ms projected for
    engine-portable comparison)."""
    ev = _t(spark, sf_dir, "events")
    wm = agg.max_watermark(ev, "ts", by=["event_type"])
    return wm.select(
        "event_type",
        F.expr("unix_micros(watermark) div 1000").alias("watermark_ms"),
    ).orderBy("event_type")


@query(
    "collection_counts_pivot",
    "SELECT user_id, "
    "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click_count, "
    "sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view_count, "
    "sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS error_count "
    "FROM events GROUP BY user_id ORDER BY user_id",
)
def collection_counts_pivot(spark, sf_dir):
    """A6 — GROUP BY parent,type pivoted to per-type count columns."""
    ev = _t(spark, sf_dir, "events")
    out = agg.collection_counts(ev, "user_id", "event_type",
                                ["click", "view", "error"])
    return out.orderBy("user_id")


@query(
    "stats_daily_rollup",
    "SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, "
    "count(*) AS count, round(sum(value), 2) AS total "
    "FROM events GROUP BY 1, 2 ORDER BY day, event_type",
)
def stats_daily_rollup(spark, sf_dir):
    """A7 — usage-stats daily rollup (count + total)."""
    ev = _t(spark, sf_dir, "events")
    return agg.stats_rollup(ev, "ts", ["event_type"], "value").orderBy(
        "day", "event_type"
    )


@query(
    "duplicate_detection",
    "SELECT l_partkey, l_suppkey, count(*) AS n FROM lineitem "
    "GROUP BY 1, 2 HAVING count(*) > 1 ORDER BY n DESC, l_partkey, l_suppkey",
)
def duplicate_detection(spark, sf_dir):
    """A10/U4 — in-batch duplicate key detection."""
    li = _t(spark, sf_dir, "lineitem")
    return agg.duplicate_groups(li, ["l_partkey", "l_suppkey"])


@query(
    "majority_vote",
    "SELECT o_custkey, winner, votes FROM ("
    "  SELECT o_custkey, o_orderpriority AS winner, count(*) AS votes,"
    "         row_number() OVER (PARTITION BY o_custkey"
    "           ORDER BY count(*) DESC, o_orderpriority) AS rn"
    "  FROM orders GROUP BY o_custkey, o_orderpriority) "
    "WHERE rn = 1 ORDER BY o_custkey",
)
def majority_vote(spark, sf_dir):
    """A11 — most-common value per key with deterministic tie-break
    (license vote pattern)."""
    orders = _t(spark, sf_dir, "orders")
    return agg.majority_vote(orders, ["o_custkey"], "o_orderpriority").orderBy(
        "o_custkey"
    )


@query(
    "dqs_score",
    "SELECT doc_id, round(("
    "  CAST(n_chars >= 100 AS INT) + CAST(lang IS NOT NULL AS INT)"
    "  + CAST(source IS NOT NULL AS INT)"
    "  + CAST(length(text) - length(replace(text, ' ', '')) + 1 >= 20 AS INT)"
    ") / 4.0, 6) AS dqs FROM documents ORDER BY doc_id",
)
def dqs_score(spark, sf_dir):
    """A8/F18 — data-quality score: weighted presence of scored fields."""
    docs = _t(spark, sf_dir, "documents")
    n_tokens = (
        F.length(F.col("text"))
        - F.length(F.regexp_replace(F.col("text"), " ", ""))
        + 1
    )
    score = (
        (F.col("n_chars") >= 100).cast("int")
        + F.col("lang").isNotNull().cast("int")
        + F.col("source").isNotNull().cast("int")
        + (n_tokens >= 20).cast("int")
    ) / 4.0
    return docs.select(
        "doc_id", F.round(score, 6).alias("dqs")
    ).orderBy("doc_id")


@query(
    "keyset_pagination",
    "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey "
    "LIMIT 50 OFFSET 100",
)
def keyset_pagination(spark, sf_dir):
    """O1 — ordered LIMIT/OFFSET listing page."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return agg.paginate(cust, "c_custkey", limit=50, offset=100)


# --------------------------------------------------------------------------
# §2.8 scalar functions
# --------------------------------------------------------------------------


@query(
    "grab_first_number",
    "SELECT event_id, "
    "CAST(replace(regexp_extract(props, '([+-]?\\d+(?:,\\d{3})*(?:\\.\\d*)?)', 1), ',', '') AS DOUBLE) AS num "
    "FROM events WHERE props IS NOT NULL ORDER BY event_id",
)
def grab_first_number_q(spark, sf_dir):
    """F3/F4 — locale-aware first-number grab from a string field."""
    ev = _t(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    return ev.select(
        "event_id", grabbers.grab_first_number("props").alias("num")
    ).orderBy("event_id")


@query(
    "date_features",
    "SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m, "
    "dayofyear(o_orderdate) AS startdayofyear FROM orders ORDER BY o_orderkey",
)
def date_features(spark, sf_dir):
    """F8 (derived features) — year/month/startdayofyear extraction
    (conversions.py:626-627)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofyear("o_orderdate").alias("startdayofyear"),
    ).orderBy("o_orderkey")


@query(
    "case_fold_discipline",
    "SELECT lower(trim(p_type)) AS p_type_folded, count(*) AS count "
    "FROM part GROUP BY 1 ORDER BY count DESC, p_type_folded",
)
def case_fold_discipline(spark, sf_dir):
    """F1/X12 — write-time case folding + keyword histogram."""
    part = _t(spark, sf_dir, "part")
    return (
        part.select(grabbers.getfield("p_type").alias("p_type_folded"))
        .groupBy("p_type_folded")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), "p_type_folded")
    )


# --------------------------------------------------------------------------
# Training-data pipeline operators (north star: dedup / text / similarity)
# --------------------------------------------------------------------------


@query(
    "exact_dedup",
    "SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp, "
    "min(doc_id) AS keeper, count(*) AS n_copies "
    "FROM documents GROUP BY 1 ORDER BY fp",
)
def exact_dedup_q(spark, sf_dir):
    """Exact dedup by content fingerprint (hash groupBy)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, "text", "doc_id").orderBy("fp")


@query(
    "token_count_quality",
    "SELECT doc_id, "
    "len(regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS n_tokens "
    "FROM documents ORDER BY doc_id",
)
def token_count_quality(spark, sf_dir):
    """Text analysis — whitespace token counting."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", text.token_count("text").alias("n_tokens")
    ).orderBy("doc_id")


@query(
    "doc_fingerprint",
    "SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp "
    "FROM documents ORDER BY doc_id",
)
def doc_fingerprint(spark, sf_dir):
    """Text analysis — content-addressed document fingerprint."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", text.fingerprint("text").alias("fp")
    ).orderBy("doc_id")


@query(
    "lang_id_heuristic",
    # marker-hit argmax, tie-broken by language code ascending; the SQL
    # mirrors the engine's marker lexicons exactly
    "WITH toks AS (SELECT doc_id, "
    "  regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t"
    "  FROM documents), "
    "scores AS (SELECT doc_id, "
    "  len(list_filter(t, x -> x IN ('the','and','of','to','a'))) AS s_en, "
    "  len(list_filter(t, x -> x IN ('el','la','de','que','y'))) AS s_es, "
    "  len(list_filter(t, x -> x IN ('le','la','et','les','des'))) AS s_fr, "
    "  len(list_filter(t, x -> x IN ('der','die','und','das','ist'))) AS s_de, "
    "  len(list_filter(t, x -> x IN ('的','是','了','在','我'))) AS s_zh "
    "  FROM toks) "
    "SELECT doc_id, CASE WHEN greatest(s_de,s_en,s_es,s_fr,s_zh) = 0 THEN 'und' "
    " WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de' "
    " WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en' "
    " WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es' "
    " WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END AS lang_pred "
    "FROM scores ORDER BY doc_id",
)
def lang_id_heuristic(spark, sf_dir):
    """Text analysis — marker-lexicon language ID (argmax, deterministic
    tie-break by language code)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", text.lang_id("text").alias("lang_pred")
    ).orderBy("doc_id")


@query(
    "ngram_jaccard_pairs",
    "WITH sh AS (SELECT doc_id AS id, sz, g FROM ("
    "  SELECT doc_id, toks, len(toks) AS n FROM ("
    "    SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks"
    "    FROM documents)) t, "
    "  LATERAL (SELECT list_distinct(CASE WHEN n >= 3 THEN "
    "    [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, n - 1)] "
    "    ELSE [array_to_string(toks, ' ')] END) AS grams) gr, "
    "  LATERAL (SELECT len(gr.grams) AS sz) z, "
    "  LATERAL unnest(gr.grams) AS u(g)), "
    "pairs AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared,"
    "  any_value(a.sz) AS sz_a, any_value(b.sz) AS sz_b "
    "  FROM sh a JOIN sh b USING (g) WHERE a.id < b.id GROUP BY a.id, b.id) "
    "SELECT id_a, id_b, round(shared / (sz_a + sz_b - shared), 6) AS jaccard "
    "FROM pairs WHERE shared / (sz_a + sz_b - shared) >= 0.8 "
    "ORDER BY id_a, id_b",
)
def ngram_jaccard_pairs_q(spark, sf_dir):
    """Near-dup — exact word-3-gram Jaccard via inverted-index self-join."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, "text", "doc_id", k=3,
                                     threshold=0.8).orderBy("id_a", "id_b")


@query(
    "ann_cosine_topk",
    "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) "
    "SELECT vec_id, round(list_dot_product("
    "   list_transform(e.embedding, x -> CAST(x AS DOUBLE)),"
    "   list_transform(q.qv, x -> CAST(x AS DOUBLE)))"
    " / (sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),"
    "         list_transform(e.embedding, x -> CAST(x AS DOUBLE))))"
    "  * sqrt(list_dot_product(list_transform(q.qv, x -> CAST(x AS DOUBLE)),"
    "         list_transform(q.qv, x -> CAST(x AS DOUBLE))))), 4) AS cosine "
    "FROM embeddings e, q ORDER BY cosine DESC, vec_id LIMIT 10",
)
def ann_cosine_topk(spark, sf_dir):
    """Similarity search — brute-force cosine top-k (exact baseline).

    Rounded to 4 decimals on both sides; ordering computed on the rounded
    value so both engines break ties identically by vec_id."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    from idb_backend_spark.functions.similarity import cosine_similarity

    sim = cosine_similarity(F.col("embedding"), ann._vec_lit(qvec))
    return (
        emb.select("vec_id", F.round(sim, 4).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


# Non-SQL-expressible operators — registered without oracles (the driver
# records rows-only checks; SURVEY §2 notes which).


@query("minhash_lsh_pairs")
def minhash_lsh_pairs_q(spark, sf_dir):
    """Near-dup — MinHash+LSH candidate pairs (hash-family not expressible
    in ANSI SQL; verified by unit tests against exact Jaccard)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        docs, "text", "doc_id", shingle_k=3, num_hashes=64, bands=16,
        threshold=0.5,
    ).orderBy("id_a", "id_b")


@query("simhash_pairs")
def simhash_pairs_q(spark, sf_dir):
    """Near-dup — SimHash fingerprints within Hamming radius 3."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_pairs(docs, "text", "doc_id", max_hamming=3).orderBy(
        "id_a", "id_b"
    )


@query("embedding_near_dup")
def embedding_near_dup_q(spark, sf_dir):
    """Near-dup — embedding-cosine pairs via random-hyperplane LSH."""
    emb = _t(spark, sf_dir, "embeddings")
    # synthetic embeddings are well-spread (max pairwise cosine ≈ 0.51 at
    # sf0.01), so the demo threshold sits at the top of that distribution
    return dedup.embedding_near_dup_pairs(
        emb, "embedding", "vec_id", threshold=0.35, n_planes=4
    ).orderBy("id_a", "id_b")


@query("ivf_ann_topk")
def ivf_ann_topk_q(spark, sf_dir):
    """Similarity search — IVF-bucketed ANN (scale path; recall checked in
    unit tests against the brute-force oracle)."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    assigned, centroids = ann.ivf_build(emb, nlist=8)
    return ann.ivf_topk(assigned, centroids, qvec, k=10, nprobe=3)
