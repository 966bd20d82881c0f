"""Executed differential for the v1/v2 API link shaping (P15) —
`record_view_links` vs the reference's OWN `format_item`
(idb/data_api/v2.py:19-56, v1.py:11-41), which load under the
auto-stub hook (flask/werkzeug/requests/psycopg2 fabricated) and run
with the module-level `current_app`/`url_for` bindings replaced by a
config dict + deterministic URL builder.

Upgrades the transcribed pins in tests/test_views.py to machine-derived
facts: parent link keyed by parent type (v2) / de-pluralized parent
type (v1), the item view's self-link delete, single-element list
wrapping, naive `k + "s"` sibling pluralization (v2) vs pass-through
keys (v1), and the dict.update collision semantics where a sibling
group overwrites the parent link key. Env-gated soak: IDB_SOAK=N runs
N-1 extra fresh seeds (SURVEY §5 r15 campaign).
"""

from __future__ import annotations

import datetime
import random
import sys
import types
from unittest import mock

import pytest
from pyspark.sql import functions as F

BASE = "http://api/view/"

PARENT_MAP = {
    "records": "recordsets",
    "mediarecords": "recordsets",
    "recordsets": "publishers",
}
TYPES = ["records", "mediarecords", "recordsets", "publishers"]


@pytest.fixture(scope="module")
def ref_views():
    import importlib.abc
    import importlib.util

    roots = {
        "gevent", "psycopg2", "boto", "boto3", "botocore", "requests",
        "elasticsearch", "celery", "redis", "lxml", "pyproj", "shapely",
        "fiona", "atomicfile", "magic", "flask", "werkzeug",
    }

    class AutoStub(importlib.abc.MetaPathFinder, importlib.abc.Loader):
        def find_spec(self, name, path=None, target=None):
            if name.split(".")[0] in roots and name not in sys.modules:
                return importlib.util.spec_from_loader(
                    name, self, is_package=True
                )
            return None

        def create_module(self, spec):
            m = mock.MagicMock()
            m.__name__ = spec.name
            m.__path__ = []
            m.__spec__ = spec
            return m

        def exec_module(self, module):
            pass

    hook = AutoStub()
    sys.meta_path.insert(0, hook)
    sys.path.insert(0, "/root/reference")
    try:
        from idb.data_api import v1 as RV1
        from idb.data_api import v2 as RV2
    finally:
        sys.meta_path.remove(hook)

    app = types.SimpleNamespace(
        config={"PARENT_MAP": PARENT_MAP, "SUPPORTED_TYPES": TYPES}
    )

    def url_for(endpoint, t=None, u=None, _external=False, **kw):
        assert endpoint == ".item", endpoint
        return f"{BASE}{t}/{u}"

    for mod in (RV1, RV2):
        mod.current_app = app
        mod.url_for = url_for
    return RV1, RV2


def _cases(rng: random.Random, n: int = 60):
    cases = []
    for i in range(n):
        t = rng.choice(TYPES)
        parent = f"p-{i}" if rng.random() < 0.7 else None
        sib = None
        if rng.random() < 0.8:
            sib = {}
            for k in rng.sample(
                ["mediarecord", "record", "recordset", "publisher",
                 "annotation"],
                rng.randrange(0, 4),
            ):
                sib[k] = [f"s-{i}-{j}" for j in range(rng.randrange(0, 4))]
            # deliberate collision arms: a sibling group whose (v2
            # pluralized / v1 verbatim) key lands on the parent link key
            if rng.random() < 0.3 and t in PARENT_MAP:
                sib[PARENT_MAP[t][:-1]] = [f"c-{i}"]
            if rng.random() < 0.15 and t in PARENT_MAP:
                sib[PARENT_MAP[t]] = [f"cc-{i}"]
        cases.append((i, t, parent, sib))
    return cases


def _ref_links(RV, t, uuid, parent, sib, v1: bool):
    r = RV.format_item(
        t, uuid, "etag", datetime.datetime(2020, 1, 2, 3, 4, 5), 7,
        parent, {"d": 1}, sib, ["rid"],
    )
    return r["idigbio:links"] if v1 else r["links"]


def test_record_view_links_v1_v2_vs_reference(ref_views, spark):
    from idb_backend_spark.query.views import record_view_links

    from conftest import soak_seeds

    RV1, RV2 = ref_views
    for seed in soak_seeds(0x715):
        rng = random.Random(seed)
        cases = _cases(rng)
        rows = [
            (i, t, parent, sib)
            for i, t, parent, sib in cases
        ]
        # one frame per type (t is a compile-time arg to the engine)
        for style, rv, v1flag in (("v2", RV2, False), ("v1", RV1, True)):
            for t in TYPES:
                sub = [r for r in rows if r[1] == t]
                if not sub:
                    continue
                df = spark.createDataFrame(
                    [(i, f"u-{i}", p, s) for i, _, p, s in sub],
                    "i long, u string, p string, "
                    "sib map<string,array<string>>",
                )
                got = {
                    r["i"]: r["o"]
                    for r in df.select(
                        "i",
                        record_view_links(
                            t, F.col("u"), F.col("p"), F.col("sib"),
                            base=BASE, style=style,
                        ).alias("o"),
                    ).collect()
                }
                for i, _, parent, sib in sub:
                    expect = _ref_links(
                        rv, t, f"u-{i}", parent, sib, v1flag
                    )
                    eng = {k: list(v) for k, v in (got[i] or {}).items()}
                    assert eng == expect, (seed, style, t, parent, sib)
