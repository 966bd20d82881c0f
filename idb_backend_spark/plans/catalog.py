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
    out = versioning.latest_per_key_agg(ev, ["user_id"], ["ts", "event_id"])
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
    out = versioning.latest_per_key_agg(
        li, ["l_partkey", "l_suppkey"],
        ["l_shipdate", "l_orderkey", "l_linenumber"],
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
    "SELECT coalesce(CAST(p_brand AS VARCHAR(32)), '') AS value, count(*) AS count "
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
    "CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)"
    " AS click_count, "
    "CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)"
    " AS view_count, "
    "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)"
    " AS error_count "
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


_COS_AB = (
    "list_dot_product("
    " list_transform(a.embedding, x -> CAST(x AS DOUBLE)),"
    " list_transform(b.embedding, x -> CAST(x AS DOUBLE)))"
    " / (sqrt(list_dot_product(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),"
    "         list_transform(a.embedding, x -> CAST(x AS DOUBLE))))"
    "  * sqrt(list_dot_product(list_transform(b.embedding, x -> CAST(x AS DOUBLE)),"
    "         list_transform(b.embedding, x -> CAST(x AS DOUBLE)))))"
)


@query(
    "embedding_near_dup",
    # exact brute-force pair oracle: the banded LSH must recall every
    # true pair at this threshold or the hash mismatches — the driver
    # gate doubles as a recall regression test
    "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
    "round(" + _COS_AB + ", 6) AS cosine "
    "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
    "WHERE " + _COS_AB + " >= 0.35 ORDER BY id_a, id_b",
)
def embedding_near_dup_q(spark, sf_dir):
    """Near-dup — embedding-cosine pairs via BANDED random-hyperplane LSH
    (AND-OR: 32 bands × auto-sized bits). Exact cosine verification runs
    on candidates only, so the output is a subset of the brute-force pair
    set — equal to it when the bands recall every true pair, which the
    exact oracle asserts."""
    emb = _t(spark, sf_dir, "embeddings")
    # synthetic embeddings are well-spread (max pairwise cosine ≈ 0.51 at
    # sf0.01), so the demo threshold sits at the top of that distribution
    return dedup.embedding_near_dup_pairs(
        emb, "embedding", "vec_id", threshold=0.35, n_bands=32
    ).orderBy("id_a", "id_b")


@query(
    "minhash_exact_verified",
    # same exact 3-gram Jaccard oracle as ngram_jaccard_pairs: the LSH
    # candidate tier must recall every true pair at the threshold
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
def minhash_exact_verified_q(spark, sf_dir):
    """Near-dup — MinHash-LSH candidates verified by EXACT shingle
    Jaccard. The sketch only prunes; the exact verify makes the operator
    oracle-checkable against the true pair set (a hash mismatch here is a
    genuine LSH recall loss)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_exact_verified_pairs(
        docs, "text", "doc_id", shingle_k=3, num_hashes=64, bands=16,
        threshold=0.8,
    ).orderBy("id_a", "id_b")


@query(
    "ivf_ann_topk",
    # exact brute-force top-k oracle (round 6): the probed buckets must
    # contain the true top-10 or the hash mismatches — the driver gate
    # doubles as an IVF recall regression test at these (nlist, nprobe)
    "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) "
    "SELECT vec_id, round(list_dot_product("
    "   list_transform(e.embedding, x -> CAST(x AS DOUBLE)),"
    "   list_transform(q.qv, x -> CAST(x AS DOUBLE)))"
    " / (sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),"
    "         list_transform(e.embedding, x -> CAST(x AS DOUBLE))))"
    "  * sqrt(list_dot_product(list_transform(q.qv, x -> CAST(x AS DOUBLE)),"
    "         list_transform(q.qv, x -> CAST(x AS DOUBLE))))), 6) AS cosine "
    "FROM embeddings e, q ORDER BY cosine DESC, vec_id LIMIT 10",
)
def ivf_ann_topk_q(spark, sf_dir):
    """Similarity search — IVF-bucketed ANN (scale path), Lloyd-refined
    codebook. The demo corpus is uniformly spread (no cluster structure —
    the worst case for IVF), so the demo probes 5/8 buckets to recall the
    exact top-10, asserted by the brute-force oracle; unit tests track
    recall across parameter settings. Clustered real corpora probe far
    fewer buckets for the same recall."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    # iterations=0: on clusterless uniform data Lloyd rounds just shuffle
    # bucket boundaries; the seeded-sample codebook probes fewer buckets
    # for full recall here (real corpora benefit from the default rounds)
    assigned, centroids = ann.ivf_build(emb, nlist=8, iterations=0)
    return ann.ivf_topk(assigned, centroids, qvec, k=10, nprobe=5)


# --------------------------------------------------------------------------
# §2.8 enrichment parity + §2.3 J9/J10 — added with the enrichment library.
# Inputs are synthesized deterministically from integer keys (identical
# literal arithmetic on both sides) since the TPC-H-ish tables carry no
# biodiversity fields; the operators under test are the engine's.
# --------------------------------------------------------------------------

from idb_backend_spark.functions import enrichment as E
from idb_backend_spark.functions import finalize as FIN
from idb_backend_spark.operators.corrections import apply_correction_rules

_POLY = [[-100.0, 10.0], [-60.0, 10.0], [-80.0, 45.0]]  # [lon, lat] ring


def _poly_crossing_sql(lat: str, lon: str, poly) -> str:
    """The same unrolled ray-cast crossing test the shim compiler emits
    (edge-by-edge XOR), as SQL: crossing-count parity."""
    terms = []
    pts = poly[:-1] if poly[0] == poly[-1] else poly
    n = len(pts)
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        if y1 == y2:
            continue
        terms.append(
            f"CAST((({y1} > {lat}) != ({y2} > {lat})) AND "
            f"({lon} < ({lat} - ({y1})) * ({(x2 - x1) / (y2 - y1)!r}) + ({x1})) AS INT)"
        )
    return "(" + " + ".join(terms) + ") % 2 = 1"


@query(
    "shim_geo_polygon",
    "SELECT c_custkey, lat, lon FROM (SELECT c_custkey, "
    f"{_GEO_LAT} AS lat, {_GEO_LON} AS lon FROM customer) g "
    f"WHERE {_poly_crossing_sql('lat', 'lon', _POLY)} "
    "ORDER BY c_custkey",
)
def shim_geo_polygon(spark, sf_dir):
    """P10/P11 — geo_polygon via the native unrolled ray-cast expression."""
    g = (
        _t(spark, sf_dir, "customer")
        .withColumn("lat", F.expr(_GEO_LAT))
        .withColumn("lon", F.expr(_GEO_LON))
        .withColumn("geopoint", F.struct(F.col("lat"), F.col("lon")))
    )
    shim = {"geopoint": {"type": "geo_polygon", "points": _POLY}}
    return (
        g.filter(compile_shim(shim))
        .select("c_custkey", "lat", "lon")
        .orderBy("c_custkey")
    )


_HOLE = [[-85.0, 15.0], [-75.0, 15.0], [-80.0, 25.0]]  # inside _POLY
_ENV = [[-90.0, 40.0], [-70.0, 20.0]]  # GeoJSON envelope [tl, br] corners


@query(
    "shim_geo_shape",
    "SELECT c_custkey, lat, lon, "
    "(lat <= 40.0 AND lat >= 20.0 AND lon >= -90.0 AND lon <= -70.0)"
    " AS in_env FROM (SELECT c_custkey, "
    f"{_GEO_LAT} AS lat, {_GEO_LON} AS lon FROM customer) g "
    f"WHERE ({_poly_crossing_sql('lat', 'lon', _POLY)}) "
    f"AND NOT ({_poly_crossing_sql('lat', 'lon', _HOLE)}) "
    "ORDER BY c_custkey",
)
def shim_geo_shape(spark, sf_dir):
    """P10 — geo_shape dispatch: polygon-with-hole containment as the
    filter (outer-ring parity AND NOT hole parity) plus an envelope
    geo_shape as a projected flag — both through the shim compiler's
    geo_shape branch (query_shim.py:85-86)."""
    from idb_backend_spark.query.shim import single_filter

    g = (
        _t(spark, sf_dir, "customer")
        .withColumn("lat", F.expr(_GEO_LAT))
        .withColumn("lon", F.expr(_GEO_LON))
        .withColumn("geopoint", F.struct(F.col("lat"), F.col("lon")))
    )
    poly_with_hole = single_filter(
        "geopoint",
        {
            "type": "geo_shape",
            "shape": {"type": "polygon", "coordinates": [_POLY, _HOLE]},
        },
    )
    envelope = single_filter(
        "geopoint",
        {"type": "geo_shape", "shape": {"type": "envelope", "coordinates": _ENV}},
    )
    return (
        g.filter(poly_with_hole)
        .select("c_custkey", "lat", "lon", envelope.alias("in_env"))
        .orderBy("c_custkey")
    )


# Synthesized verbatim coordinate strings: mostly 3-decimal in-range values,
# with modulo classes for flip (%13), bounds (%17) and low-precision (%19).
_LAT_S = (
    "CASE WHEN c_custkey % 13 = 0 THEN '120.5' "
    "WHEN c_custkey % 17 = 0 THEN '95.0' "
    "WHEN c_custkey % 19 = 0 THEN CAST((c_custkey * 7) % 160 - 80 AS VARCHAR(32)) || '.25' "
    "ELSE CAST((c_custkey * 7) % 160 - 80 AS VARCHAR(32)) || '.125' END"
)
_LON_S = (
    "CASE WHEN c_custkey % 13 = 0 THEN '45.125' "
    "WHEN c_custkey % 17 = 0 THEN '200.0' "
    "ELSE CAST((c_custkey * 13) % 360 - 180 AS VARCHAR(32)) || '.125' END"
)


@query(
    "geo_normalize_flags",
    "WITH g AS (SELECT c_custkey, "
    f"{_LAT_S} AS lat_s, {_LON_S} AS lon_s FROM customer), "
    "p AS (SELECT c_custkey, lat_s, lon_s, "
    "  CAST(lat_s AS DOUBLE) AS lat0, CAST(lon_s AS DOUBLE) AS lon0, "
    "  length(regexp_extract(lat_s, '\\.(\\d+)', 1)) AS latexp, "
    "  length(regexp_extract(lon_s, '\\.(\\d+)', 1)) AS lonexp FROM g), "
    "f AS (SELECT *, ((lat0 >= -180 AND lat0 < -90) OR (lat0 > 90 AND lat0 <= 180))"
    "  AND lon0 BETWEEN -90 AND 90 AS flip FROM p), "
    "v AS (SELECT c_custkey, latexp, lonexp, flip, "
    "  CASE WHEN flip THEN lon0 ELSE lat0 END AS lat1, "
    "  CASE WHEN flip THEN lat0 ELSE lon0 END AS lon1 FROM f), "
    "b AS (SELECT *, lat1 < -90 OR lat1 > 90 OR lon1 < -180 OR lon1 > 180 AS oob FROM v) "
    "SELECT c_custkey, "
    "CASE WHEN oob THEN NULL ELSE lat1 END AS lat, "
    "CASE WHEN oob THEN NULL ELSE lon1 END AS lon, "
    "concat_ws(',', CASE WHEN flip AND NOT oob THEN 'geopoint_pre_flip' END, "
    "CASE WHEN oob THEN 'geopoint_bounds' END, "
    "CASE WHEN NOT oob AND (latexp <= 2 OR lonexp <= 2) THEN 'geopoint_low_precision' END"
    ") AS flags FROM b ORDER BY c_custkey",
)
def geo_normalize_flags(spark, sf_dir):
    """F6 (expression part) — coordinate flip/bounds/precision with flags."""
    g = (
        _t(spark, sf_dir, "customer")
        .withColumn("lat_s", F.expr(_LAT_S))
        .withColumn("lon_s", F.expr(_LON_S))
    )
    r = E.geo_normalize(F.col("lat_s"), F.col("lon_s"))
    return g.select(
        "c_custkey",
        r["lat"].alias("lat"),
        r["lon"].alias("lon"),
        F.concat_ws(
            ",", r["flag_pre_flip"], r["flag_bounds"], r["flag_low_precision"]
        ).alias("flags"),
    ).orderBy("c_custkey")


_BOR_S = (
    "CASE c_custkey % 10 WHEN 0 THEN 'PreservedSpecimen' WHEN 1 THEN 'fossil' "
    "WHEN 2 THEN 'Living Specimen' WHEN 3 THEN 'material sample' "
    "WHEN 4 THEN 'some weird specimen' WHEN 5 THEN 'machine observation' "
    "WHEN 6 THEN 'Human Observation' WHEN 7 THEN 'occurrence records' "
    "WHEN 8 THEN 'Exsiccati' ELSE NULL END"
)


@query(
    "bor_normalize",
    "WITH g AS (SELECT c_custkey, lower(trim(" + _BOR_S + ")) AS v FROM customer), "
    "m AS (SELECT c_custkey, v, v IS NOT NULL AND v != '' AS filled, "
    "  CASE WHEN contains(v, 'machine') AND contains(v, 'observation') THEN 'machineobservation' "
    "  WHEN contains(v, 'preserved') THEN 'preservedspecimen' "
    "  WHEN contains(v, 'fossil') THEN 'fossilspecimen' "
    "  WHEN contains(v, 'living') THEN 'livingspecimen' "
    "  WHEN contains(v, 'material') THEN 'materialsample' "
    "  WHEN contains(v, 'specimen') THEN 'preservedspecimen' "
    "  WHEN contains(v, 'observation') THEN 'humanobservation' "
    "  WHEN contains(v, 'occurrence') THEN 'occurrence' END AS matched FROM g) "
    "SELECT c_custkey, CASE WHEN filled THEN matched END AS basisofrecord, "
    "concat_ws(',', CASE WHEN filled AND matched IS NULL THEN 'dwc_basisofrecord_removed' END, "
    "CASE WHEN (filled AND matched IS NULL) OR NOT filled THEN 'dwc_basisofrecord_invalid' END"
    ") AS flags FROM m ORDER BY c_custkey",
)
def bor_normalize(spark, sf_dir):
    """F13 — basisOfRecord controlled-vocabulary normalization + flags."""
    g = _t(spark, sf_dir, "customer").withColumn("bor", F.expr(_BOR_S))
    r = E.fix_basis_of_record(F.col("bor"))
    return g.select(
        "c_custkey",
        r["value"].alias("basisofrecord"),
        F.concat_ws(",", r["flag_removed"], r["flag_invalid"]).alias("flags"),
    ).orderBy("c_custkey")


_RANK_S = (
    "CASE p_partkey % 9 WHEN 0 THEN 'species' WHEN 1 THEN 'Sp.' "
    "WHEN 2 THEN 'Division' WHEN 3 THEN 'unknown' WHEN 4 THEN 'blahblah' "
    "WHEN 5 THEN 'subtribe' WHEN 6 THEN 'family' WHEN 7 THEN 'var.' "
    "ELSE NULL END"
)


@query(
    "taxon_rank_normalize",
    "WITH g AS (SELECT p_partkey, lower(trim(" + _RANK_S + ")) AS v FROM part), "
    "m AS (SELECT p_partkey, v, v IS NOT NULL AND v != '' AS filled, "
    "  v IN ('species','sp.','division','unknown','family','var.') AS in_mapping, "
    "  CASE v WHEN 'species' THEN 'species' WHEN 'sp.' THEN 'species' "
    "    WHEN 'division' THEN 'phylum' WHEN 'family' THEN 'family' "
    "    WHEN 'var.' THEN 'variety' END AS mapped, "
    "  v IN ('species','subtribe','family','variety','phylum') AS acceptable FROM g) "
    "SELECT p_partkey, "
    "CASE WHEN filled AND in_mapping THEN mapped "
    "  WHEN filled AND acceptable THEN v END AS taxonrank, "
    "concat_ws(',', "
    "CASE WHEN filled AND in_mapping AND mapped IS NOT NULL AND mapped != v THEN 'dwc_taxonrank_replaced' END, "
    "CASE WHEN filled AND ((in_mapping AND mapped IS NULL) OR (NOT in_mapping AND NOT acceptable)) THEN 'dwc_taxonrank_removed' END, "
    "CASE WHEN filled AND ((in_mapping AND mapped IS NULL) OR (NOT in_mapping AND NOT acceptable)) THEN 'dwc_taxonrank_invalid' END"
    ") AS flags FROM m ORDER BY p_partkey",
)
def taxon_rank_normalize(spark, sf_dir):
    """F14 — taxonrank mapping/acceptable-vocabulary normalization."""
    g = _t(spark, sf_dir, "part").withColumn("tr", F.expr(_RANK_S))
    r = E.fix_taxon_rank(F.col("tr"))
    return g.select(
        "p_partkey",
        r["value"].alias("taxonrank"),
        F.concat_ws(
            ",", r["flag_replaced"], r["flag_removed"], r["flag_invalid"]
        ).alias("flags"),
    ).orderBy("p_partkey")


_SN_S = (
    "CASE c_custkey % 5 WHEN 0 THEN 'Acer rubrum' WHEN 1 THEN 'Quercus' "
    "WHEN 4 THEN 'X123 weird' ELSE NULL END"
)
_GEN_S = "CASE c_custkey % 5 WHEN 2 THEN 'Betula' WHEN 3 THEN NULL ELSE 'Tilia' END"
_EPI_S = "CASE c_custkey % 5 WHEN 2 THEN 'nigra' ELSE NULL END"


@query(
    "name_crossfill",
    "WITH g AS (SELECT c_custkey, " + _SN_S + " AS sn, " + _GEN_S + " AS gen, "
    + _EPI_S + " AS epi FROM customer), "
    "f AS (SELECT c_custkey, "
    "  coalesce(sn, CASE WHEN gen IS NOT NULL THEN concat_ws(' ', gen, epi) END) AS sn2, "
    "  CASE WHEN sn IS NULL AND gen IS NOT NULL THEN 'scientificname_added' END AS flag "
    "  FROM g), "
    "t AS (SELECT c_custkey, sn2, flag, "
    "  string_split_regex(trim(sn2), '\\s+') AS toks FROM f), "
    "p AS (SELECT c_custkey, sn2, flag, "
    "  CASE WHEN regexp_matches(toks[1], '^[A-Za-z][a-z-]+$') THEN lower(toks[1]) END AS genus, "
    "  toks[2] AS second FROM t) "
    "SELECT c_custkey, sn2 AS scientificname, flag, genus, "
    "CASE WHEN genus IS NOT NULL AND regexp_matches(second, '^[a-z-]+$') "
    "  THEN lower(second) END AS specificepithet "
    "FROM p ORDER BY c_custkey",
)
def name_crossfill(spark, sf_dir):
    """F12 — genus+specificepithet → scientificname crossfill, then the
    heuristic binomial parse back to genus/specificepithet
    (conversions.py:745-768; the external name-parser service is replaced
    by native expressions)."""
    g = (
        _t(spark, sf_dir, "customer")
        .withColumn("sn", F.expr(_SN_S))
        .withColumn("gen", F.expr(_GEN_S))
        .withColumn("epi", F.expr(_EPI_S))
    )
    filled = E.scientificname_fill(F.col("sn"), F.col("gen"), F.col("epi"))
    g = g.select(
        "c_custkey",
        filled["value"].alias("scientificname"),
        filled["flag_added"].alias("flag"),
    )
    parsed = E.genus_species_parse(F.col("scientificname"))
    return g.select(
        "c_custkey",
        "scientificname",
        "flag",
        parsed["genus"].alias("genus"),
        parsed["specificepithet"].alias("specificepithet"),
    ).orderBy("c_custkey")


_WKT_S = (
    "CASE s_suppkey % 5 WHEN 0 THEN 'POINT (-81.2 29.6)' "
    "WHEN 1 THEN 'polygon ((0 0, 10 0, 10 10, 0 0))' "
    "WHEN 2 THEN '1 1, 2 2, 3 1' "
    "WHEN 3 THEN 'LINESTRING (0 0, 1 1)' ELSE NULL END"
)


@query(
    "wkt_geoshape_parse",
    # Golden-expectation oracle (SURVEY §5 style): the WKT input is a pure
    # function of the key, so the expected parse is stated directly —
    # replicating Spark's regex kernels in DuckDB's RE2 dialect would test
    # the dialects, not the operator.
    "SELECT s_suppkey, "
    "CAST(CASE s_suppkey % 5 WHEN 0 THEN -81.2 END AS DOUBLE) AS pt_lon, "
    "CAST(CASE s_suppkey % 5 WHEN 0 THEN 29.6 END AS DOUBLE) AS pt_lat, "
    "CAST(CASE s_suppkey % 5 WHEN 1 THEN 4 WHEN 2 THEN 3 END AS INTEGER) AS ring_n, "
    "CAST(CASE s_suppkey % 5 WHEN 1 THEN 0.0 WHEN 2 THEN 1.0 END AS DOUBLE) AS ring0_lon, "
    "CAST(CASE s_suppkey % 5 WHEN 1 THEN 0.0 WHEN 2 THEN 1.0 END AS DOUBLE) AS ring0_lat "
    "FROM supplier ORDER BY s_suppkey",
)
def wkt_geoshape_parse(spark, sf_dir):
    """F16 — WKT POINT/POLYGON parse incl. the bare-coordinate-list
    fallback (conversions.py:771-816), flattened to scalars for the
    cross-engine compare."""
    g = _t(spark, sf_dir, "supplier").withColumn("wkt", F.expr(_WKT_S))
    pt = FIN.wkt_point(F.col("wkt"))
    ring = FIN.wkt_polygon_ring(F.col("wkt"))
    g = g.select("s_suppkey", pt.alias("pt"), ring.alias("ring"))
    return g.select(
        "s_suppkey",
        F.col("pt.lon").alias("pt_lon"),
        F.col("pt.lat").alias("pt_lat"),
        F.when(F.col("ring").isNotNull(), F.size("ring"))
        .cast("int")
        .alias("ring_n"),
        F.try_element_at("ring", F.lit(1))["lon"].alias("ring0_lon"),
        F.try_element_at("ring", F.lit(1))["lat"].alias("ring0_lat"),
    ).orderBy("s_suppkey")


_LIC_S = (
    "CASE o_orderkey % 7 WHEN 0 THEN 'http://creativecommons.org/licenses/by/4.0/' "
    "WHEN 1 THEN 'https://creativecommons.org/publicdomain/zero/1.0' "
    "WHEN 2 THEN 'http://creativecommons.org/licenses/by-nc/3.0' "
    "WHEN 3 THEN 'http://creativecommons.org/licenses/by/4.0/' "
    "WHEN 4 THEN 'all rights reserved' ELSE NULL END"
)
_LIC_MAP_SQL = (
    "CASE r WHEN 'http://creativecommons.org/licenses/by/4.0/' THEN 'CC4 BY' "
    "WHEN 'https://creativecommons.org/publicdomain/zero/1.0' THEN 'CC0' "
    "WHEN 'http://creativecommons.org/licenses/by-nc/3.0' THEN 'CC3 BY-NC' END"
)


@query(
    "license_majority",
    "WITH g AS (SELECT o_custkey, " + _LIC_S + " AS r FROM orders), "
    "c AS (SELECT o_custkey, " + _LIC_MAP_SQL + " AS code FROM g), "
    "n AS (SELECT o_custkey, code, count(*) AS votes FROM c "
    "      WHERE code IS NOT NULL GROUP BY 1, 2), "
    "w AS (SELECT o_custkey, code AS license, votes, row_number() OVER ("
    "  PARTITION BY o_custkey ORDER BY votes DESC, code) AS rn FROM n) "
    "SELECT o_custkey, license, votes FROM w WHERE rn = 1 ORDER BY o_custkey",
)
def license_majority(spark, sf_dir):
    """F10/A11 — rights-string canonicalization + per-entity majority vote."""
    g = _t(spark, sf_dir, "orders").withColumn("r", F.expr(_LIC_S))
    coded = g.select(
        "o_custkey", E.license_lookup(F.col("r")).alias("code")
    ).filter(F.col("code").isNotNull())
    out = agg.majority_vote(coded, ["o_custkey"], "code")
    return out.select(
        "o_custkey", F.col("winner").alias("license"), F.col("votes")
    ).orderBy("o_custkey")


@query(
    "stable_surrogate_id",
    "SELECT c_custkey, "
    "substring(h, 1, 8) || '-' || substring(h, 9, 4) || '-' || "
    "substring(h, 13, 4) || '-' || substring(h, 17, 4) || '-' || "
    "substring(h, 21, 12) AS sid "
    "FROM (SELECT c_custkey, md5('idigbio:' || c_name) AS h FROM customer) "
    "ORDER BY c_custkey",
)
def stable_surrogate_id(spark, sf_dir):
    """A4 — deterministic surrogate id per unique value (uuid-shaped md5;
    the byte-exact RFC-4122 uuid5 variant is unit-tested against Python's
    uuid module — sha1 is not portable to every oracle engine)."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey", E.stable_id_md5(F.col("c_name")).alias("sid")
    ).orderBy("c_custkey")


_GB_S = (
    "'voucher AB' || CAST(doc_id * 37 % 90000 + 10000 AS VARCHAR(32)) || "
    "' and XY-' || CAST(doc_id * 101 % 900000 + 100000 AS VARCHAR(32)) || ' end'"
)


@query(
    "genbank_accessions",
    "SELECT doc_id, array_to_string(regexp_extract_all(" + _GB_S + ", "
    "'([a-zA-Z]{1,2}-?_?\\d{5,6})', 1), '|') AS accessions "
    "FROM documents ORDER BY doc_id",
)
def genbank_accessions_q(spark, sf_dir):
    """F15 — GenBank accession regex findall.

    Output is pipe-joined (not a raw array) because the driver's hash
    canonicalizer cannot sort array-typed columns.
    """
    from idb_backend_spark.functions.grabbers import genbank_accessions

    docs = _t(spark, sf_dir, "documents").withColumn("s", F.expr(_GB_S))
    return docs.select(
        "doc_id",
        F.array_join(genbank_accessions("s"), "|").alias("accessions"),
    ).orderBy("doc_id")


@query(
    "date_fallback_assembly",
    "WITH g AS (SELECT o_orderkey, "
    "  CASE WHEN o_orderkey % 5 = 0 THEN o_orderdate END AS ed, "
    "  year(o_orderdate) AS y, "
    "  CASE WHEN o_orderkey % 3 != 0 THEN month(o_orderdate) END AS m, "
    "  CASE WHEN o_orderkey % 3 = 1 THEN day(o_orderdate) END AS d, "
    "  CASE WHEN o_orderkey % 2 = 0 THEN dayofyear(o_orderdate) END AS sdoy "
    "  FROM orders) "
    "SELECT o_orderkey, CASE WHEN ed IS NOT NULL THEN ed "
    "WHEN m IS NOT NULL AND d IS NOT NULL THEN make_date(y, m, d) "
    "WHEN m IS NULL AND sdoy IS NOT NULL THEN make_date(y, 1, 1) + CAST(sdoy - 1 AS INTEGER) "
    "WHEN m IS NOT NULL THEN make_date(y, m, 1) "
    "ELSE make_date(y, 1, 1) END AS datecollected "
    "FROM g ORDER BY o_orderkey",
)
def date_fallback_assembly(spark, sf_dir):
    """F8 (fallback path) — datecollected assembly from year/month/day/
    startDayOfYear parts (conversions.py:604-624)."""
    g = (
        _t(spark, sf_dir, "orders")
        .withColumn(
            "ed", F.when(F.col("o_orderkey") % 5 == 0, F.col("o_orderdate"))
        )
        .withColumn("y", F.year("o_orderdate"))
        .withColumn(
            "m", F.when(F.col("o_orderkey") % 3 != 0, F.month("o_orderdate"))
        )
        .withColumn(
            "d", F.when(F.col("o_orderkey") % 3 == 1, F.dayofmonth("o_orderdate"))
        )
        .withColumn(
            "sdoy",
            F.when(F.col("o_orderkey") % 2 == 0, F.dayofyear("o_orderdate")),
        )
    )
    return g.select(
        "o_orderkey",
        E.date_fallback(
            F.col("ed"), F.col("y"), F.col("m"), F.col("d"), F.col("sdoy")
        ).alias("datecollected"),
    ).orderBy("o_orderkey")


@query(
    "media_url_precedence",
    "WITH g AS (SELECT p_partkey, "
    "  CASE WHEN p_partkey % 4 = 0 THEN 'http://a/' || CAST(p_partkey AS VARCHAR(32)) END AS au, "
    "  CASE WHEN p_partkey % 3 = 0 THEN 'http://b/' || CAST(p_partkey AS VARCHAR(32)) END AS bq, "
    "  'http://dct/' || CAST(p_partkey AS VARCHAR(32)) AS dct, "
    "  'http://dc/' || CAST(p_partkey AS VARCHAR(32)) AS dc, "
    "  p_partkey % 2 = 0 AS has_ac FROM part) "
    "SELECT p_partkey, coalesce(au, bq, "
    "CASE WHEN NOT has_ac THEN coalesce(dct, dc) END) AS accessuri "
    "FROM g ORDER BY p_partkey",
)
def media_url_precedence(spark, sf_dir):
    """F11 — media URL selection precedence incl. the any-ac:-key guard."""
    pk = F.col("p_partkey")
    g = (
        _t(spark, sf_dir, "part")
        .withColumn(
            "au", F.when(pk % 4 == 0, F.concat(F.lit("http://a/"), pk.cast("string")))
        )
        .withColumn(
            "bq", F.when(pk % 3 == 0, F.concat(F.lit("http://b/"), pk.cast("string")))
        )
        .withColumn("dct", F.concat(F.lit("http://dct/"), pk.cast("string")))
        .withColumn("dc", F.concat(F.lit("http://dc/"), pk.cast("string")))
        .withColumn("has_ac", pk % 2 == 0)
    )
    return g.select(
        "p_partkey",
        E.access_uri(
            F.col("au"), F.col("bq"), F.col("dct"), F.col("dc"), F.col("has_ac")
        ).alias("accessuri"),
    ).orderBy("p_partkey")


@query(
    "corrections_apply",
    "SELECT c_custkey, "
    "CASE WHEN lower(trim(c_mktsegment)) = 'building' THEN 'bldg' "
    "WHEN lower(trim(c_mktsegment)) = 'machinery' THEN NULL "
    "ELSE c_mktsegment END AS c_mktsegment, "
    "CASE WHEN lower(trim(c_mktsegment)) = 'building' THEN 'c_mktsegment_replaced' "
    "WHEN lower(trim(c_mktsegment)) = 'machinery' THEN 'c_mktsegment_removed' "
    "END AS flag_c_mktsegment "
    "FROM customer ORDER BY c_custkey",
)
def corrections_apply(spark, sf_dir):
    """J10 — data-driven correction rules via broadcast join + rewrite
    (replacement and removal rules with provenance flags)."""
    cust = _t(spark, sf_dir, "customer")
    rules = cust.sparkSession.createDataFrame(
        [("building", "bldg"), ("machinery", None)],
        "c_mktsegment string, __set string",
    )
    out = apply_correction_rules(cust, rules, ["c_mktsegment"], "c_mktsegment")
    return out.select(
        "c_custkey", "c_mktsegment", "flag_c_mktsegment"
    ).orderBy("c_custkey")


@query(
    "identity_match",
    "WITH cand AS (SELECT o_orderkey, ident FROM orders, "
    "  UNNEST(['c' || CAST(o_custkey AS VARCHAR(32)), "
    "    CASE WHEN o_orderkey % 5 = 0 THEN 'c' || CAST(o_custkey + 1 AS VARCHAR(32)) END"
    "  ]) AS u(ident) WHERE ident IS NOT NULL), "
    "hits AS (SELECT cand.o_orderkey, c.c_custkey FROM cand "
    "  JOIN customer c ON cand.ident = 'c' || CAST(c.c_custkey AS VARCHAR(32))) "
    "SELECT o_orderkey, count(DISTINCT c_custkey) AS n_matched, "
    "min(c_custkey) AS matched_uuid, count(DISTINCT c_custkey) > 1 AS conflict "
    "FROM hits GROUP BY o_orderkey ORDER BY o_orderkey",
)
def identity_match(spark, sf_dir):
    """J9 — ingest identity matching: candidate identifiers probed against
    the existing-identifier table; cross-record conflict detection
    (db_check.py:302-339)."""
    ok = F.col("o_orderkey")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    cand = (
        orders.select(
            ok,
            F.array(
                F.concat(F.lit("c"), F.col("o_custkey").cast("string")),
                F.when(
                    ok % 5 == 0,
                    F.concat(F.lit("c"), (F.col("o_custkey") + 1).cast("string")),
                ),
            ).alias("ids"),
        )
        .select(ok, F.explode("ids").alias("ident"))
        .filter(F.col("ident").isNotNull())
    )
    existing = cust.select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("ident"),
        F.col("c_custkey"),
    )
    hits = cand.join(existing, "ident")
    return (
        hits.groupBy("o_orderkey")
        .agg(
            F.countDistinct("c_custkey").alias("n_matched"),
            F.min("c_custkey").alias("matched_uuid"),
            (F.countDistinct("c_custkey") > 1).alias("conflict"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "ingest_summary",
    "WITH store AS (SELECT o_orderkey AS id, o_orderstatus AS etag FROM orders"
    "  WHERE o_orderkey % 3 != 0), "
    "batch AS (SELECT o_orderkey AS id, "
    "  CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS etag"
    "  FROM orders WHERE o_orderkey % 2 != 0) "
    "SELECT CASE WHEN s.id IS NULL THEN 'create' "
    "WHEN b.id IS NULL THEN 'delete' "
    "WHEN s.etag != b.etag THEN 'update' ELSE 'unchanged' END AS status, "
    "count(*) AS n FROM store s FULL OUTER JOIN batch b ON s.id = b.id "
    "GROUP BY 1 ORDER BY status",
)
def ingest_summary(spark, sf_dir):
    """A9 — ingest run summary: create/update/delete/unchanged counters
    from the store↔batch reconciliation (db_check.py:216-247)."""
    orders = _t(spark, sf_dir, "orders")
    ok = F.col("o_orderkey")
    store = orders.filter(ok % 3 != 0).select(
        ok.alias("id"), F.col("o_orderstatus").alias("s_etag")
    )
    batch = orders.filter(ok % 2 != 0).select(
        ok.alias("id"),
        F.when(ok % 5 == 0, "X").otherwise(F.col("o_orderstatus")).alias("b_etag"),
    )
    full = store.join(batch, "id", "full_outer")
    status = (
        F.when(F.col("s_etag").isNull(), "create")
        .when(F.col("b_etag").isNull(), "delete")
        .when(F.col("s_etag") != F.col("b_etag"), "update")
        .otherwise("unchanged")
    )
    return (
        full.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )


@query(
    "text_quality_metrics",
    "WITH t AS (SELECT doc_id, text, "
    "  regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks"
    "  FROM documents) "
    "SELECT doc_id, len(toks) AS n_tokens, "
    "round((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))"
    " / length(text), 6) AS punct_ratio, "
    "round(len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is')))"
    " / len(toks), 6) AS stopword_ratio "
    "FROM t ORDER BY doc_id",
)
def text_quality_metrics(spark, sf_dir):
    """Text analysis — quality scoring signals: token count, punctuation
    ratio, stopword ratio."""
    from idb_backend_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", tokens("text").alias("toks")
    )
    stop = ["the", "and", "of", "to", "a", "in", "is"]
    n_tok = F.size("toks")
    punct = (
        F.length("text")
        - F.length(F.regexp_replace("text", "[.,;:!?]", ""))
    ) / F.length("text")
    stop_ratio = (
        F.size(F.filter("toks", lambda x: x.isin(stop))) / n_tok
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(punct, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
    ).orderBy("doc_id")


@query(
    "bpe_token_count",
    "SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))"
    " AS n_bpe FROM documents ORDER BY doc_id",
)
def bpe_token_count(spark, sf_dir):
    """Text analysis — BPE-ish regex token counting (word pieces +
    standalone punctuation)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(
                "text", F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0
            )
        ).alias("n_bpe"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Versioned store (§2.3 J1 / §2.5 W2 / §2.7 U2 / X5) and multimodal (F24)
# --------------------------------------------------------------------------


@query(
    "versioned_merge",
    # store = latest version per key; batch = new harvest. Append rows only
    # where the etag changed; new keys start at version 0, changed keys at
    # version+1 (reference db.py:144-155).
    "WITH store AS (SELECT o_orderkey AS uuid, o_orderstatus AS etag, "
    "  CAST(o_orderkey % 4 AS INT) AS version FROM orders WHERE o_orderkey % 3 != 0), "
    "batch AS (SELECT o_orderkey AS uuid, "
    "  CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS etag "
    "  FROM orders WHERE o_orderkey % 2 != 0) "
    "SELECT b.uuid, b.etag, "
    "CASE WHEN s.uuid IS NULL THEN 0 ELSE s.version + 1 END AS version "
    "FROM batch b LEFT JOIN store s ON b.uuid = s.uuid "
    "WHERE s.uuid IS NULL OR s.etag != b.etag ORDER BY b.uuid",
)
def versioned_merge(spark, sf_dir):
    """W2/X5 — etag-gated merge: version assignment for changed rows only
    (the common unchanged case is filtered before any write)."""
    orders = _t(spark, sf_dir, "orders")
    ok = F.col("o_orderkey")
    store = orders.filter(ok % 3 != 0).select(
        ok.alias("uuid"),
        F.col("o_orderstatus").alias("etag"),
        (ok % 4).cast("int").alias("version"),
    )
    batch = orders.filter(ok % 2 != 0).select(
        ok.alias("uuid"),
        F.when(ok % 5 == 0, "X").otherwise(F.col("o_orderstatus")).alias("etag"),
    )
    out = versioning.merge_batch(store, batch, key="uuid", etag_col="etag")
    return out.select("uuid", "etag", "version").orderBy("uuid")


@query(
    "tombstone_deletes",
    "WITH store AS (SELECT o_orderkey AS uuid, o_orderstatus AS etag, "
    "  CAST(o_orderkey % 4 AS INT) AS version FROM orders), "
    "seen AS (SELECT o_orderkey AS uuid FROM orders WHERE o_orderkey % 7 != 0) "
    "SELECT s.uuid, s.version + 1 AS version, "
    "'9a4e35834eb80d9af64bcd07ed996b9ec0e60d92' AS etag "
    "FROM store s LEFT JOIN seen ON s.uuid = seen.uuid "
    "WHERE seen.uuid IS NULL ORDER BY s.uuid",
)
def tombstone_deletes(spark, sf_dir):
    """U2 — anti-join delete detection emitting tombstone versions with the
    reference's fixed tombstone etag (db.py:33, db_check.py:441-454)."""
    orders = _t(spark, sf_dir, "orders")
    ok = F.col("o_orderkey")
    store = orders.select(
        ok.alias("uuid"),
        F.col("o_orderstatus").alias("etag"),
        (ok % 4).cast("int").alias("version"),
    )
    seen = orders.filter(ok % 7 != 0).select(ok.alias("uuid"))
    out = versioning.tombstones_for_deletes(store, seen, key="uuid")
    return out.select("uuid", "version", "etag").orderBy("uuid")


@query(
    "media_sniff_buckets",
    # binary blobs synthesized per doc with magic-byte prefixes by doc_id%4:
    # JPEG / PNG / WAV / junk — the oracle knows the expected bucket directly
    "SELECT CASE doc_id % 4 WHEN 0 THEN 'images' WHEN 1 THEN 'images' "
    "WHEN 2 THEN 'sounds' ELSE NULL END AS bucket, count(*) AS n "
    "FROM documents GROUP BY 1 ORDER BY n DESC, bucket NULLS FIRST",
)
def media_sniff_buckets(spark, sf_dir):
    """F24 — magic-byte media validation through the mapInPandas pipeline,
    aggregated to per-bucket counts."""
    from idb_backend_spark.functions.multimodal import validate_media

    docs = _t(spark, sf_dir, "documents")
    blobs = docs.select(
        F.col("doc_id").alias("id"),
        F.concat(
            F.when(F.col("doc_id") % 4 == 0, F.lit(b"\xff\xd8\xff\xe0"))
            .when(F.col("doc_id") % 4 == 1, F.lit(b"\x89PNG\r\n\x1a\n"))
            .when(
                F.col("doc_id") % 4 == 2,
                F.lit(b"RIFF\x00\x00\x00\x00WAVE"),
            )
            .otherwise(F.lit(b"text")),
            F.col("text").cast("binary"),
        ).alias("content"),
    )
    meta = validate_media(blobs)
    return (
        meta.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc_nulls_first("bucket"))
    )


@query(
    "media_derivatives",
    # JPEG blobs (doc_id%4==0) pass fullsize through byte-identical; the
    # derivative fan-out is one row per (decodable blob, dtype). The
    # oracle pins the per-(dtype, jpeg-source) row counts; content bytes
    # are hash-derived (not SQL-expressible) and covered by unit tests.
    "WITH src AS (SELECT doc_id, doc_id % 4 = 0 AS is_jpeg FROM documents) "
    "SELECT d.dtype, src.is_jpeg, count(*) AS n FROM src, "
    "  (SELECT unnest(['fullsize','thumbnail','webview']) AS dtype) d "
    "GROUP BY 1, 2 ORDER BY dtype, is_jpeg",
)
def media_derivatives(spark, sf_dir):
    """F25 — derivative generation through the PIL-gated mapInPandas
    kernel (fake kernel in this environment; identical plumbing either
    way), aggregated per (dtype, source-is-jpeg)."""
    from idb_backend_spark.functions.multimodal import generate_derivatives

    docs = _t(spark, sf_dir, "documents")
    blobs = docs.select(
        F.col("doc_id").alias("id"),
        F.concat(
            F.when(F.col("doc_id") % 4 == 0, F.lit(b"\xff\xd8\xff\xe0"))
            .when(F.col("doc_id") % 4 == 1, F.lit(b"\x89PNG\r\n\x1a\n"))
            .when(
                F.col("doc_id") % 4 == 2,
                F.lit(b"RIFF\x00\x00\x00\x00WAVE"),
            )
            .otherwise(F.lit(b"text")),
            F.col("text").cast("binary"),
        ).alias("content"),
    )
    dv = generate_derivatives(blobs, fake=True)
    return (
        dv.withColumn("is_jpeg", F.col("id") % 4 == 0)
        .groupBy("dtype", "is_jpeg")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("dtype", "is_jpeg")
    )


@query("etl_enrichment_pipeline")
def etl_enrichment_pipeline(spark, sf_dir):
    """§3.3 composed — the full enrichment hot path over the fact table:
    verbatim projection, typed grabbers, geo normalization + flags, date
    fallback + bounds flag, BOR + taxon-rank vocabularies, license lookup,
    flag folding, and dqs scoring — entirely native expressions (the
    reference's 1.33 ms/record Python loop, conversions.py:915-930).

    No SQL oracle: each component is oracle-checked individually above;
    this entry exists for end-to-end shape and the benchmark. Throughput
    comparison against the reference's 750 rec/s/core figure comes from
    bench.py timing of this query at sf0.1 (~600k rows).
    """
    from idb_backend_spark.functions.flags import dqs_score, fold_flags
    from idb_backend_spark.functions.grabbers import (
        grab_first_number,
        int_grabber,
    )

    li = _t(spark, sf_dir, "lineitem")
    lk = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    # synthesized verbatim fields (the reference reads these from raw DwC)
    raw = li.select(
        lk.alias("rowid"),
        F.concat((F.col("l_partkey") % 160 - 80).cast("string"), F.lit(".125"))
        .alias("lat_s"),
        F.concat((F.col("l_suppkey") % 360 - 180).cast("string"), F.lit(".25"))
        .alias("lon_s"),
        F.col("l_shipdate").alias("eventdate"),
        F.year("l_shipdate").cast("string").alias("year_s"),
        F.month("l_shipdate").cast("string").alias("month_s"),
        F.concat(F.col("l_quantity").cast("string"), F.lit(" m")).alias("elev_s"),
        F.expr(
            "CASE l_linenumber % 5 WHEN 0 THEN 'PreservedSpecimen' "
            "WHEN 1 THEN 'fossil' WHEN 2 THEN 'machine observation' "
            "WHEN 3 THEN 'Exsiccati' ELSE NULL END"
        ).alias("bor_s"),
        F.expr(
            "CASE l_linenumber % 4 WHEN 0 THEN 'species' WHEN 1 THEN 'Sp.' "
            "WHEN 2 THEN 'blah' ELSE NULL END"
        ).alias("rank_s"),
        F.expr(
            "CASE l_linenumber % 3 WHEN 0 THEN "
            "'http://creativecommons.org/licenses/by/4.0/' ELSE NULL END"
        ).alias("rights_s"),
    )
    geo = E.geo_normalize(F.col("lat_s"), F.col("lon_s"))
    bor = E.fix_basis_of_record(F.col("bor_s"))
    rank = E.fix_taxon_rank(F.col("rank_s"))
    dc = E.date_fallback(
        F.col("eventdate"), F.col("year_s"), F.col("month_s"),
        F.lit(None), F.lit(None),
    )
    enriched = raw.select(
        "rowid",
        geo["lat"].alias("lat"),
        geo["lon"].alias("lon"),
        dc.alias("datecollected"),
        int_grabber("elev_s").alias("minelevation"),
        grab_first_number("elev_s").alias("elev_f"),
        bor["value"].alias("basisofrecord"),
        rank["value"].alias("taxonrank"),
        E.license_lookup(F.col("rights_s")).alias("license"),
        fold_flags(
            geo["flag_pre_flip"], geo["flag_bounds"], geo["flag_low_precision"],
            E.date_bounds_flag(dc), bor["flag_removed"], bor["flag_invalid"],
            rank["flag_replaced"], rank["flag_removed"],
        ).alias("flags"),
    )
    scored = enriched.withColumn(
        "dqs",
        F.round(
            dqs_score(
                {"lat": 1, "datecollected": 1, "basisofrecord": 1,
                 "taxonrank": 1, "license": 1, "minelevation": 1},
                F.col("flags"),
                maxscore=6.0,
            ),
            6,
        ),
    )
    # pipe-join the flags array at the boundary: the driver's hash
    # canonicalizer cannot sort array-typed output columns
    return scored.withColumn("flags", F.array_join("flags", "|"))


@query(
    "raw_field_access",
    # P13 — dual addressing: predicate on the raw open-schema map, output
    # from the raw map ('data.' paths, download.py:245-253, :155-163)
    "SELECT doc_id, lang AS lang_raw, source AS source_raw FROM documents "
    "WHERE lang = 'en' AND n_chars >= 200 ORDER BY doc_id",
)
def raw_field_access(spark, sf_dir):
    """P13 — records carry the verbatim body as map<string,string> `data`
    beside typed columns; queries can address either. Here the raw map is
    built from the table, then both filtered and projected through map
    access only."""
    docs = _t(spark, sf_dir, "documents")
    with_raw = docs.select(
        "doc_id",
        "n_chars",
        F.map_from_arrays(
            F.array(F.lit("dc:language"), F.lit("dc:source")),
            F.array(F.col("lang"), F.col("source")),
        ).alias("data"),
    )
    return (
        with_raw.filter(
            (F.col("data")["dc:language"] == "en") & (F.col("n_chars") >= 200)
        )
        .select(
            "doc_id",
            F.col("data")["dc:language"].alias("lang_raw"),
            F.col("data")["dc:source"].alias("source_raw"),
        )
        .orderBy("doc_id")
    )


@query(
    "stats_rollup_nested",
    "WITH fine AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, "
    "  event_type, user_id, count(*) AS n FROM events GROUP BY 1, 2, 3) "
    "SELECT day, event_type, CAST(sum(n) AS BIGINT) AS count, "
    "string_agg(CAST(user_id AS VARCHAR(32)) || ':' || "
    "CAST(n AS VARCHAR(32)), ',' ORDER BY user_id) AS items "
    "FROM fine GROUP BY day, event_type ORDER BY day, event_type",
)
def stats_rollup_nested_q(spark, sf_dir):
    """A7 (full shape) — daily rollup with within-group term frequency map
    (collect.py:132-217). The map payload is serialized key-sorted as
    'k:v,k:v' at the boundary so the driver hasher (which cannot sort
    map-typed columns) can grade it against the string_agg oracle."""
    ev = _t(spark, sf_dir, "events")
    out = agg.stats_rollup_nested(ev, "ts", ["event_type"], "user_id")
    return out.select(
        "day",
        "event_type",
        "count",
        F.array_join(
            F.transform(
                F.array_sort(F.map_entries("items")),
                lambda e: F.concat_ws(
                    ":", e["key"].cast("string"), e["value"].cast("string")
                ),
            ),
            ",",
        ).alias("items"),
    ).orderBy("day", "event_type")


@query(
    "media_presence_flags",
    # F9/P14 — hasMedia/hasSpecimen from sibling-link arrays: orders with
    # at least one qualifying lineitem "media" link
    "WITH links AS (SELECT o.o_orderkey, "
    "  (SELECT count(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey"
    "   AND l.l_returnflag = 'R') AS n_media, "
    "  (SELECT count(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey"
    "   AND l.l_returnflag = 'N') AS n_spec "
    "  FROM orders o) "
    "SELECT o_orderkey, n_media > 0 AS hasMedia, n_spec > 0 AS hasSpecimen "
    "FROM links ORDER BY o_orderkey",
)
def media_presence_flags_q(spark, sf_dir):
    """F9/P14 — derive media/specimen presence booleans from collected
    sibling-link arrays (conversions.py:632-680)."""
    from idb_backend_spark.functions.finalize import media_presence_flags

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    media_links = li.filter(F.col("l_returnflag") == "R").groupBy(
        F.col("l_orderkey").alias("o_orderkey")
    ).agg(F.collect_list("l_linenumber").alias("mediarecords"))
    spec_links = li.filter(F.col("l_returnflag") == "N").groupBy(
        F.col("l_orderkey").alias("o_orderkey")
    ).agg(F.collect_list("l_linenumber").alias("records"))
    joined = orders.select("o_orderkey").join(media_links, "o_orderkey", "left").join(
        spec_links, "o_orderkey", "left"
    )
    flags = media_presence_flags(F.col("mediarecords"), F.col("records"))
    return joined.select(
        "o_orderkey",
        flags["hasMedia"].alias("hasMedia"),
        flags["hasSpecimen"].alias("hasSpecimen"),
    ).orderBy("o_orderkey")


@query(
    "identifier_extraction",
    # F23 — precedence-ordered candidate identifiers, namespaced + folded.
    # Pipe-joined (not a raw array): the driver hasher can't sort arrays.
    "SELECT o_orderkey, array_to_string(["
    "'rs' || CAST(o_custkey % 10 AS VARCHAR(32)) || '\\' || "
    "lower(trim('URN:CAT:' || CAST(o_orderkey AS VARCHAR(32)))), "
    "lower(trim(o_orderpriority))"
    "], '|') AS ids FROM orders ORDER BY o_orderkey",
)
def identifier_extraction(spark, sf_dir):
    """F23 — identifier extraction precedence: namespaced occurrenceID then
    verbatim recordId (db_check.py:64-165)."""
    from idb_backend_spark.functions.finalize import record_identifiers

    orders = _t(spark, sf_dir, "orders")
    rsid = F.concat(F.lit("rs"), (F.col("o_custkey") % 10).cast("string"))
    occ = F.concat(F.lit("URN:CAT:"), F.col("o_orderkey").cast("string"))
    return orders.select(
        "o_orderkey",
        F.array_join(
            record_identifiers(
                rsid, occ, F.col("o_orderpriority"), F.lit(None).cast("string")
            ),
            "|",
        ).alias("ids"),
    ).orderBy("o_orderkey")


@query(
    "duplicate_clusters",
    # chains of 5: edges (i, i+1) unless i%5==4 -> cluster = 5*floor(i/5)
    "SELECT doc_id, CAST(doc_id // 5 * 5 AS BIGINT) AS cluster "
    "FROM documents ORDER BY doc_id",
)
def duplicate_clusters_q(spark, sf_dir):
    """Connected components over dup pairs (min-label propagation). The
    synthetic edge set is chains of five consecutive doc_ids, so the
    closed-form cluster id is an exact oracle."""
    docs = _t(spark, sf_dir, "documents")
    pairs = docs.filter(F.col("doc_id") % 5 != 4).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )
    verts = docs.select("doc_id")
    out = dedup.duplicate_clusters(pairs, vertices=verts)
    return out.select(F.col("id").alias("doc_id"), "cluster").orderBy("doc_id")


_TERM_CASE = (
    "CASE o_orderkey % 7 WHEN 0 THEN 'Collector' WHEN 1 THEN 'MonthCollected' "
    "WHEN 2 THEN 'dwc:catalogNumber' WHEN 3 THEN 'ac:accessURI' "
    "WHEN 4 THEN 'Annotations' WHEN 5 THEN 'coreid' "
    "ELSE 'SomethingNovel' END"
)


@query(
    "term_canonicalize",
    # golden expectations for each synthesized header, straight from the
    # public standards registry (data/term_translate.py)
    "WITH v AS (SELECT o_orderkey, " + _TERM_CASE + " AS verbatim FROM orders) "
    "SELECT o_orderkey, verbatim, "
    "CASE verbatim WHEN 'Collector' THEN 'dwc:recordedBy' "
    "  WHEN 'MonthCollected' THEN 'dwc:month' "
    "  WHEN 'dwc:catalogNumber' THEN 'dwc:catalogNumber' "
    "  WHEN 'ac:accessURI' THEN 'ac:accessURI' "
    "  WHEN 'Annotations' THEN NULL "
    "  WHEN 'coreid' THEN 'coreid' ELSE verbatim END AS canonical, "
    "CASE verbatim WHEN 'Collector' THEN 'dwc:Occurrence' "
    "  WHEN 'MonthCollected' THEN 'dwc:Occurrence' "
    "  WHEN 'dwc:catalogNumber' THEN 'dwc:Occurrence' "
    "  WHEN 'ac:accessURI' THEN 'dwc:Multimedia' "
    "  WHEN 'Annotations' THEN 'dwc:Multimedia' "
    "  WHEN 'coreid' THEN 'dwc:Text:Extension' "
    "  ELSE 'Unknown' END AS term_class "
    "FROM v ORDER BY o_orderkey",
)
def term_canonicalize(spark, sf_dir):
    """S3 distributed — verbatim provider headers canonicalized through the
    FULL 496-row translate registry (fieldnames.py:92-589) compiled to a
    broadcast-size literal map; the oracle pins golden expectations for
    translate hits, identity rows, drop-marked rows, and unknown headers.
    """
    from idb_backend_spark.data.term_translate import TRANSLATE

    canon_pairs, class_pairs = [], []
    for raw, (canon, cls) in TRANSLATE.items():
        canon_pairs += [F.lit(raw), F.lit(canon)]
        class_pairs += [F.lit(raw), F.lit(cls)]
    canon_map = F.create_map(*canon_pairs)
    class_map = F.create_map(*class_pairs)

    orders = _t(spark, sf_dir, "orders")
    v = orders.select("o_orderkey", F.expr(_TERM_CASE).alias("verbatim"))
    known = class_map[F.col("verbatim")]
    return v.select(
        "o_orderkey",
        "verbatim",
        F.when(known.isNotNull(), canon_map[F.col("verbatim")])
        .otherwise(F.col("verbatim"))
        .alias("canonical"),
        F.coalesce(known, F.lit("Unknown")).alias("term_class"),
    ).orderBy("o_orderkey")


_RG_LON = (
    "CASE WHEN c_custkey % 17 = 0 THEN -104.0 "
    "WHEN c_custkey % 13 = 0 THEN -134.0 "
    "WHEN c_custkey % 11 = 0 THEN -51.9 "
    "WHEN c_custkey % 7 = 0 THEN 20.5 "
    "WHEN c_custkey % 5 = 0 THEN -98.5 "
    "WHEN c_custkey % 3 = 0 THEN 0.0 ELSE 104.0 END"
)
_RG_LAT = (
    "CASE WHEN c_custkey % 17 = 0 THEN -35.0 "
    "WHEN c_custkey % 13 = 0 THEN -25.0 "
    "WHEN c_custkey % 11 = 0 THEN 14.2 "
    "WHEN c_custkey % 7 = 0 THEN 78.9 "
    "WHEN c_custkey % 5 = 0 THEN 39.8 "
    "WHEN c_custkey % 3 = 0 THEN 0.0 ELSE 35.0 END"
)
_RG_ISO = (
    "CASE WHEN c_custkey % 17 = 0 THEN 'CN' "
    "WHEN c_custkey % 13 = 0 THEN 'AU' "
    "WHEN c_custkey % 11 = 0 THEN 'BR' "
    "WHEN c_custkey % 7 = 0 THEN 'IN' "
    "WHEN c_custkey % 5 = 0 THEN 'CA' "
    "WHEN c_custkey % 3 = 0 THEN NULL ELSE 'CN' END"
)


@query(
    "rev_geocode",
    # golden expectations per modulo class, validated against the
    # packaged coarse world outlines (data/world_regions.py): sign/axis
    # flip corrections, mismatch-no-correction, ocean failure, clean hit
    "SELECT c_custkey, "
    "CAST(CASE WHEN c_custkey % 17 = 0 THEN 104.0 "
    " WHEN c_custkey % 13 = 0 THEN 134.0 "
    " WHEN c_custkey % 11 = 0 THEN -51.9 "
    " WHEN c_custkey % 7 = 0 THEN 78.9 "
    " WHEN c_custkey % 5 = 0 THEN -98.5 "
    " WHEN c_custkey % 3 = 0 THEN 0.0 ELSE 104.0 END AS DOUBLE) AS lon, "
    "CAST(CASE WHEN c_custkey % 17 = 0 THEN 35.0 "
    " WHEN c_custkey % 13 = 0 THEN -25.0 "
    " WHEN c_custkey % 11 = 0 THEN -14.2 "
    " WHEN c_custkey % 7 = 0 THEN 20.5 "
    " WHEN c_custkey % 5 = 0 THEN 39.8 "
    " WHEN c_custkey % 3 = 0 THEN 0.0 ELSE 35.0 END AS DOUBLE) AS lat, "
    "CASE WHEN c_custkey % 17 = 0 THEN 'CN' "
    " WHEN c_custkey % 13 = 0 THEN 'AU' "
    " WHEN c_custkey % 11 = 0 THEN 'BR' "
    " WHEN c_custkey % 7 = 0 THEN 'IN' "
    " WHEN c_custkey % 5 = 0 THEN 'US' "
    " WHEN c_custkey % 3 = 0 THEN NULL ELSE 'CN' END AS country, "
    "CASE WHEN c_custkey % 17 = 0 THEN "
    "  'rev_geocode_failure,rev_geocode_both_sign,rev_geocode_corrected' "
    " WHEN c_custkey % 13 = 0 THEN "
    "  'rev_geocode_failure,rev_geocode_lon_sign,rev_geocode_corrected' "
    " WHEN c_custkey % 11 = 0 THEN "
    "  'rev_geocode_failure,rev_geocode_lat_sign,rev_geocode_corrected' "
    " WHEN c_custkey % 7 = 0 THEN "
    "  'rev_geocode_failure,rev_geocode_flip,rev_geocode_corrected' "
    " WHEN c_custkey % 5 = 0 THEN 'rev_geocode_mismatch' "
    " WHEN c_custkey % 3 = 0 THEN 'rev_geocode_failure' "
    " ELSE NULL END AS flags "
    "FROM customer ORDER BY c_custkey",
)
def rev_geocode_q(spark, sf_dir):
    """F7 — reverse geocode + 8-way flip correction loop
    (conversions.py:513-563) over the packaged coarse country outlines,
    1°-grid prefiltered, as an Arrow-batched pandas UDF. Synthesized
    coordinate classes exercise: both-sign / lon-sign / lat-sign / axis
    flips (each corrected to the stated country), a mismatch that no flip
    can fix (flag only, coordinates kept), an ocean failure with no
    stated country (no flip attempted), and a clean in-country hit."""
    from idb_backend_spark.functions.geo import default_geocoder, rev_geocode_udf

    cust = _t(spark, sf_dir, "customer")
    inp = cust.select(
        "c_custkey",
        F.expr(f"CAST(({_RG_LON}) AS DOUBLE)").alias("in_lon"),
        F.expr(f"CAST(({_RG_LAT}) AS DOUBLE)").alias("in_lat"),
        F.expr(_RG_ISO).alias("iso"),
    )
    out = inp.withColumn(
        "rg", rev_geocode_udf(default_geocoder())("in_lon", "in_lat", "iso")
    )
    return out.select(
        "c_custkey",
        F.col("rg.lon").alias("lon"),
        F.col("rg.lat").alias("lat"),
        F.col("rg.country").alias("country"),
        F.col("rg.flags").alias("flags"),
    ).orderBy("c_custkey")
