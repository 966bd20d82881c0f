"""Mediaing maintenance dataflows (operators/mediaing.py) — golden pins
against idigbio_ingestion/mediaing/{updatedb.py,fetcher.py,__init__.py}.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from idb_backend_spark.operators import mediaing as M


def _media(spark, rows):
    return spark.createDataFrame(
        rows, "url string, type string, mime string, last_status int, last_check timestamp"
    )


def _recs(spark, rows):
    return spark.createDataFrame(
        rows, "uuid string, accessuri string, mediatype string, format string"
    )


# ---------------------------------------------------------------------------
# discover_media_urls — updatedb.find_new_urls (updatedb.py:56-104)
# ---------------------------------------------------------------------------


def test_discovery_url_cleanup_and_empty_url_survives(spark):
    """&amp; (only) unescaped, then strip; an '' accessuri passes the
    pre-cleanup None gate and is inserted verbatim (updatedb.py:81-83)."""
    recs = _recs(
        spark,
        [
            ("a", "  http://x/?a=1&amp;b=2&lt;3 ", None, None),
            ("b", "", None, None),
            ("c", None, "images", "image/jpeg"),
        ],
    )
    inserts, updates = M.discover_media_urls(recs, _media(spark, []))
    got = {r["url"] for r in inserts.collect()}
    assert got == {"http://x/?a=1&b=2&lt;3", ""}
    assert updates.count() == 0


def test_discovery_first_wins_insert_and_ignores_always_apply(spark):
    recs = _recs(
        spark,
        [
            ("u2", "http://x/1", "sounds", "audio/mpeg"),
            ("u1", "http://x/1", "images", "image/jpeg"),
            # ignored prefix drops even when an explicit prefix is given
            ("u3", "http://www.tropicos.org/img/9", "images", "image/jpeg"),
        ],
    )
    inserts, _ = M.discover_media_urls(
        recs, _media(spark, []), prefix="http://"
    )
    rows = {r["url"]: (r["type"], r["mime"]) for r in inserts.collect()}
    # first-wins pinned to min(order_col) = u1
    assert rows == {"http://x/1": ("images", "image/jpeg")}


@pytest.mark.parametrize(
    "t,mime,et,em,expect",
    [
        # same pair -> no change
        ("images", "image/jpeg", "images", "image/jpeg", False),
        # changed, mime truthy, t truthy -> update
        ("sounds", "audio/mpeg", "images", "image/jpeg", True),
        # changed but mime NULL -> never null out (updatedb.py:94)
        (None, None, "images", "image/jpeg", False),
        # changed but mime '' -> '' is falsy, no update
        ("sounds", "", "images", "image/jpeg", False),
        # t falsy ('' and NULL) allowed only onto a NULL existing type
        (None, "image/png", None, "image/jpeg", True),
        ("", "image/png", None, "image/jpeg", True),
        (None, "image/png", "images", "image/jpeg", False),
        # both NULL existing (truthy tuple!) routes to update branch,
        # then the rule applies
        ("images", "image/jpeg", None, None, True),
    ],
)
def test_discovery_never_null_update_rule(spark, t, mime, et, em, expect):
    recs = _recs(spark, [("u1", "http://x/1", t, mime)])
    media = _media(spark, [("http://x/1", et, em, 200, None)])
    inserts, updates = M.discover_media_urls(recs, media)
    assert inserts.count() == 0
    got = updates.collect()
    assert (len(got) == 1) is expect
    if expect:
        assert got[0]["type"] == t and got[0]["mime"] == mime
        # applied updates force a refetch (updatedb.py:114)
        assert got[0]["last_status"] is None and got[0]["last_check"] is None


def test_discovery_update_last_scan_wins(spark):
    """The reference appends every qualifying row and executemany lets
    the last one stand (updatedb.py:95,:113-115) — pinned to
    max(order_col)."""
    recs = _recs(
        spark,
        [
            ("u1", "http://x/1", "images", "image/png"),
            ("u2", "http://x/1", "sounds", "audio/mpeg"),
        ],
    )
    media = _media(spark, [("http://x/1", "videos", "video/mp4", 200, None)])
    _, updates = M.discover_media_urls(recs, media)
    got = updates.collect()
    assert len(got) == 1
    assert (got[0]["type"], got[0]["mime"]) == ("sounds", "audio/mpeg")


# ---------------------------------------------------------------------------
# fetch_eligible — fetcher.get_items (fetcher.py:203-235)
# ---------------------------------------------------------------------------

_NOW = datetime.datetime(2026, 8, 1)
_OLD = datetime.datetime(2026, 6, 1)
_FRESH = datetime.datetime(2026, 7, 30)


def test_fetch_eligibility_matrix(spark):
    media = _media(
        spark,
        [
            ("http://a/1", "images", None, None, None),      # never tried
            ("http://a/2", None, None, None, None),           # type NULL: out
            ("http://a/3", "images", None, 200, _OLD),        # OK: terminal
            ("http://a/4", "images", None, 303, _OLD),        # <400: terminal
            ("http://a/5", "images", None, 404, _OLD),        # stale 4xx: in
            ("http://a/6", "images", None, 404, _FRESH),      # fresh 4xx: out
            ("http://a/7", "images", None, 1403, _OLD),       # FAUX_DENIED: in
            ("http://a/8", "images", None, 1001, _OLD),       # VALIDATION: in
        ],
    )
    got = [r["url"] for r in M.fetch_eligible(media, "2026-07-01").collect()]
    assert got == ["http://a/1", "http://a/5", "http://a/7", "http://a/8"]


def test_fetch_ignores_only_without_prefix_and_prefix_grouping(spark):
    media = _media(
        spark,
        [
            ("http://www.tropicos.org/img/1", "images", None, None, None),
            ("http://ok.org/x", "images", None, None, None),
            ("http://bare-host", "images", None, None, None),
            ("https://h.org?q=1", "images", None, None, None),
        ],
    )
    # default: ignore list applies
    got = {r["url"] for r in M.fetch_eligible(media, "2026-07-01").collect()}
    assert "http://www.tropicos.org/img/1" not in got
    # explicit prefix bypasses the ignore list (fetcher.py:218-226)
    got2 = M.fetch_eligible(
        media, "2026-07-01", prefix="http://www.tropicos.org/"
    ).collect()
    assert [r["url"] for r in got2] == ["http://www.tropicos.org/img/1"]
    # prefix grouping: bare host -> NULL; '?' counts as a separator
    pref = {r["url"]: r["__prefix"] for r in M.fetch_eligible(media, "2026-07-01").collect()}
    assert pref["http://bare-host"] is None
    assert pref["https://h.org?q=1"] == "https://h.org?"
    assert pref["http://ok.org/x"] == "http://ok.org/"


# ---------------------------------------------------------------------------
# classify_html_response — fetcher.inspect_html_response (fetcher.py:494-502)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "content,mime,expect",
    [
        ("<html>Access Denied</html>", "text/html", 1403),
        ("ACCESS DENIED", "text/plain", 1403),
        # the BLOCKED pattern needs TWO spaces without 'address'
        ("your ip  blocked", "text/html", 1509),
        ("your ip blocked", "text/html", None),
        ("IP ADDRESS BLACKLISTED", "text/html", 1509),
        # denied wins over blocked (checked first)
        ("access denied: ip  blocked", "text/html", 1403),
        # gate: only html/plain bodies are inspected
        ("access denied", "image/jpeg", None),
        ("nothing suspicious", "text/html", None),
    ],
)
def test_classify_html_response(spark, content, mime, expect):
    df = spark.createDataFrame([(content, mime)], "c string, m string")
    got = df.select(
        M.classify_html_response(F.col("c"), F.col("m")).alias("s")
    ).collect()[0]["s"]
    assert got == expect


def test_derivative_candidates(spark):
    """derivatives.py:102-110 — literal false (NULL invisible), bucket
    membership, blacklist exclusion."""
    df = spark.createDataFrame(
        [
            ("e1", "images", False),
            ("e2", "images", None),     # NULL flag: never swept
            ("e3", "images", True),
            ("e4", "sounds", False),
            ("e5", "datasets", False),  # bucket not in sweep
            ("e6", "images", False),    # blacklisted
        ],
        "etag string, bucket string, derivatives boolean",
    )
    got = {
        r["etag"]
        for r in M.derivative_candidates(
            df, ("images", "sounds"), blacklist=("e6",)
        ).collect()
    }
    assert got == {"e1", "e4"}
