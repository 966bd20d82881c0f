"""Mediaing maintenance dataflows — media-URL discovery, fetch
eligibility, and HTML error-page classification.

The reference's mediaing subsystem has three row-level dataflows beyond
the validation/derivative kernels (functions/multimodal.py):

* ``updatedb.find_new_urls`` (idigbio_ingestion/mediaing/updatedb.py:
  56-104) — scan latest mediarecords, extract each record's access URI,
  and diff against the ``media`` table: unseen urls are inserted
  (first-wins within the scan), seen urls are updated only under a
  never-null rule.
* ``fetcher.get_items`` (idigbio_ingestion/mediaing/fetcher.py:203-235)
  — the fetch-eligibility predicate selecting which media rows to
  (re)download, with url-prefix grouping.
* ``fetcher.inspect_html_response`` (fetcher.py:494-502) — classify an
  HTML/plain-text body that failed media validation as a disguised
  denial/blacklist page.

All three are native-expression DataFrame ops here; nothing needs a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Prefixes excluded from discovery and (default) fetching —
#: idigbio_ingestion/mediaing/__init__.py:5-13, verbatim and in order.
IGNORE_PREFIXES: tuple[str, ...] = (
    "http://media.idigbio.org/",
    "http://api.idigbio.org/v1/recordsets/",
    "https://api.idigbio.org/v2/media/",
    "http://api.idigbio.org/v2/media/",
    "http://www.tropicos.org/",
    "http://n2t.net/ark:/65665/",  # Smithsonian
    "http://arctos.database.museum/",
)

#: fetcher.py:113 — the per-host grouping prefix. Note the trailing
#: ``[/?]``: a bare ``http://host`` with no path separator has NO prefix
#: (group NULL), exactly like the reference's ``m and m.group()``.
PREFIX_RE = r"^https?://[^/]*[/?]"

#: Status enum values used by the classifier
#: (idigbio_ingestion/mediaing/__init__.py:16-59).
STATUS_FAUX_DENIED = 1403
STATUS_BLOCKED = 1509


def clean_media_url(url: Column) -> Column:
    """updatedb.py:83 — ``url.replace("&amp;", "&").strip()``: exactly
    ONE HTML entity is unescaped (``&amp;`` — not ``&lt;``/``&gt;`` or
    numeric refs), then whitespace-stripped. A chain that resolved to
    the empty string (the F11 '' resolution, conversions.py:711-723)
    stays '' — the reference's ``url is None`` gate ran BEFORE this
    cleanup, so an '' url survives discovery and is inserted verbatim."""
    from idb_backend_spark.functions.grabbers import py_strip

    return py_strip(F.regexp_replace(url, "&amp;", "&"))


def _truthy(c: Column) -> Column:
    """Python string truthiness: not NULL and not ''."""
    return c.isNotNull() & (c != "")


def discover_media_urls(
    mediarecords: DataFrame,
    media: DataFrame,
    *,
    prefix: str | None = None,
    ignores: tuple[str, ...] = IGNORE_PREFIXES,
    order_col: str = "uuid",
) -> tuple[DataFrame, DataFrame]:
    """updatedb.find_new_urls (updatedb.py:56-104) as one DataFrame
    diff. ``mediarecords`` carries the latest-view rows ALREADY run
    through the F11 kernels: columns ``accessuri`` (raw, pre-cleanup),
    ``mediatype``, ``format`` (the reference calls get_accessuri /
    get_media_type per row at :80-88), plus ``order_col``; apply any
    ``since`` watermark upstream (the reference pushes ``modified > %s``
    into its scan, :67-70). ``media`` carries (url, type, mime).

    Returns ``(inserts, updates)``:

    * inserts — urls absent from ``media``, ONE row per url. The
      reference's first-wins is Postgres heap-scan order (``to_insert``
      dict, :96-97) — nondeterministic upstream; pinned here to
      min-by-``order_col``, the deterministic stand-in.
    * updates — urls present in ``media`` whose (type, mime) would
      change under the never-null rule (:90-95):
      ``(t, mime) != entry AND mime AND (t OR entry.type IS NULL)``
      with Python truthiness ('' counts as absent). The reference
      appends EVERY qualifying scanned row and lets executemany run
      them all — last scan order wins (:95, :113-115); pinned here to
      max-by-``order_col`` per url. An applied update also resets
      last_status/last_check to NULL, forcing a refetch (:114).

    Rule quirks preserved: the existence test is ``if entry:`` on a
    (type, mime) TUPLE — truthy even when both elements are NULL, so
    presence alone routes to the update branch; the tuple inequality is
    None-safe (spelled null-safe-equality here); '' mime never updates,
    '' type can only land on a NULL-typed row.

    Unlike fetch_eligible, the ignore list applies UNCONDITIONALLY here
    — even when a prefix is given (updatedb.py:84-85 are two
    independent ``continue`` gates, where get_items' SQL puts them in
    an if/else) — so discovery can never register an ignored url, while
    an explicit-prefix fetch CAN retry one already in the table.

    Scale: one equi-join on url between the two frames (broadcast-able
    when ``media`` is the smaller side on a fresh store; at steady
    state both are large — a plain shuffle join on a near-unique key,
    no skew) plus one groupBy(url) on each output leg.
    """
    rows = mediarecords.select(
        clean_media_url(F.col("accessuri")).alias("url"),
        F.col("mediatype").alias("t"),
        F.col("format").alias("mime"),
        F.col(order_col).alias("__ord"),
    ).filter(F.col("accessuri").isNotNull())
    if prefix is not None:
        rows = rows.filter(F.col("url").startswith(prefix))
    for p in ignores:
        rows = rows.filter(~F.col("url").startswith(p))

    existing = media.select(
        F.col("url"), F.col("type").alias("__et"), F.col("mime").alias("__em")
    )

    inserts = (
        rows.join(existing, "url", "left_anti")
        .groupBy("url")
        .agg(
            F.min_by(F.struct("t", "mime"), F.col("__ord")).alias("__w"),
        )
        .select("url", F.col("__w.t").alias("type"), F.col("__w.mime").alias("mime"))
    )

    joined = rows.join(existing, "url")
    changed = ~(
        F.col("t").eqNullSafe(F.col("__et"))
        & F.col("mime").eqNullSafe(F.col("__em"))
    )
    rule = changed & _truthy(F.col("mime")) & (
        _truthy(F.col("t")) | F.col("__et").isNull()
    )
    updates = (
        joined.filter(rule)
        .groupBy("url")
        .agg(F.max_by(F.struct("t", "mime"), F.col("__ord")).alias("__w"))
        .select(
            "url",
            F.col("__w.t").alias("type"),
            F.col("__w.mime").alias("mime"),
            F.lit(None).cast("int").alias("last_status"),
            F.lit(None).cast("timestamp").alias("last_check"),
        )
    )
    return inserts, updates


def fetch_eligibility(stale_before: str) -> Column:
    """The bare get_items selection predicate (fetcher.py:210-216):

        type IS NOT NULL AND (last_status IS NULL
            OR (last_status >= 400 AND last_check < stale_before))

    Note ``type IS NOT NULL`` is the literal SQL gate — an EMPTY-STRING
    type passes it (only NULL is excluded), unlike the Python-truthiness
    gates elsewhere in mediaing."""
    return F.col("type").isNotNull() & (
        F.col("last_status").isNull()
        | (
            (F.col("last_status") >= 400)
            & (F.col("last_check") < F.lit(stale_before).cast("timestamp"))
        )
    )


def fetch_eligible(
    media: DataFrame,
    stale_before: str,
    *,
    prefix: str | None = None,
    ignores: tuple[str, ...] = IGNORE_PREFIXES,
) -> DataFrame:
    """fetcher.get_items' selection (fetcher.py:203-235): media rows
    that should be (re)downloaded —

        type IS NOT NULL AND (last_status IS NULL
            OR (last_status >= 400 AND last_check < stale_before))

    ``stale_before`` is the literal timestamp bound (the reference's
    ``now() - '1 month'::interval``, :106 LAST_CHECK_INTERVAL).

    Pinned contract points: any non-null status BELOW 400 is TERMINAL —
    200 of course, but also a stored 303 SEE_OTHER is never retried
    (Status enum, mediaing/__init__.py:24-25); every failure >= 400,
    including the synthetic statuses (VALIDATION_FAILURE 1001,
    FAUX_DENIED 1403, BLOCKED 1509 — written by update_db_status via
    ``.value``, fetcher.py:258-274), is retried once stale. The ignore
    list applies ONLY when no explicit prefix is given (the SQL's
    if/else at :218-226 — passing a prefix deliberately reaches ignored
    hosts like tropicos). Output is ordered by url (:227) and carries
    ``__prefix`` — the PREFIX_RE host-grouping key, NULL for a bare
    ``http://host`` with no path separator (:234 ``m and m.group()``).
    The ORDER BY is parity with the reference's consecutive-groupby
    batching; at scale, repartition on ``__prefix`` instead — the
    per-host grouping needs co-location, not a global sort.
    """
    out = media.filter(fetch_eligibility(stale_before))
    if prefix is not None:
        out = out.filter(F.col("url").startswith(prefix))
    else:
        for p in ignores:
            out = out.filter(~F.col("url").startswith(p))
    return out.withColumn(
        "__prefix",
        F.nullif(F.regexp_extract(F.col("url"), PREFIX_RE, 0), F.lit("")),
    ).orderBy("url")


def classify_html_response(
    content: Column, detected_mime: Column
) -> Column:
    """fetcher.inspect_html_response (fetcher.py:494-502) + its call
    gate (:425-429): after a media-validation failure, an HTML or plain
    -text body is sniffed for disguised denial pages. Returns the
    synthetic status (1403 FAUX_DENIED / 1509 BLOCKED) or NULL (the
    validation failure stands).

    Pinned quirks: the gate requires detected_mime IN ('text/html',
    'text/plain'); DENIED is checked FIRST ("access denied",
    case-insensitive via the lower() fold AND re.I); BLOCKED's pattern
    is ``ip (?:address)? (blocked|blacklisted)`` — the optional group
    sits BETWEEN two mandatory spaces, so the common phrase
    "ip blocked" (one space) does NOT match: only "ip  blocked" (two
    spaces) or "ip address blocked" do. The pattern is compiled without
    re.I but searched against lowered content, so uppercase variants
    match anyway.
    """
    lowered = F.lower(content)
    gate = detected_mime.isin("text/html", "text/plain")
    return F.when(
        gate & lowered.rlike("access denied"), F.lit(STATUS_FAUX_DENIED)
    ).when(
        gate & lowered.rlike("ip (?:address)? (blocked|blacklisted)"),
        F.lit(STATUS_BLOCKED),
    )


def derivative_candidates(
    objects: DataFrame,
    buckets: tuple[str, ...],
    blacklist: tuple[str, ...] = (),
) -> DataFrame:
    """The derivative sweep's candidate selection
    (idigbio_ingestion/mediaing/derivatives.py:102-110 objects_for_
    buckets): objects still needing thumbnail/webview/fullsize
    generation.

    Pins: ``derivatives = false`` is the LITERAL predicate — a NULL
    flag row is invisible to the sweep (only an explicit false is
    retried); the etag blacklist (idb/blacklists/derivatives.py — known
    broken media that would fail every run) applies ONLY to this bucket
    sweep, never to the human-specified etag path
    (derivatives.py:73-75's comment); successful generations flip the
    flag to true (:94-98) so the sweep converges, failures stay false
    and retry. The reference's ``ORDER BY random()`` spreads source
    hosts across the pool — an execution-order concern with no
    result-set meaning, dropped here (Spark's partition parallelism
    provides the spread; a deterministic engine op must not carry
    nondeterministic order)."""
    out = objects.filter(
        (F.col("derivatives") == False)  # noqa: E712 — literal false, NULL excluded
        & F.col("bucket").isin(*buckets)
    )
    if blacklist:
        out = out.filter(~F.col("etag").isin(*blacklist))
    return out.select("etag", "bucket")
