"""Oracle result-dtype invariants.

Round 5's only red row (`training_corpus_e2e`) was an ORACLE-side dtype
artifact: DuckDB types `sum()` over integers as HUGEINT, which the
driver's value hasher renders as a double ('3213.0') against Spark's
bigint ('3213') — identical values, failed hash. The repo convention is
to CAST every integer aggregate in oracle SQL to BIGINT (e.g.
q_textsim.py, q_store.py); this test makes the convention structural so
a new oracle cannot reintroduce the class.

DESCRIBE gives DuckDB's static result types without executing the
query, so the sweep covers all oracles in well under a second.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_every_oracle_describes_cleanly_and_returns_no_hugeint(con):
    from idb_backend_spark.plans.catalog import ORACLE

    assert ORACLE, "catalog registered no oracles"
    offenders: dict[str, object] = {}
    for name, sql in ORACLE.items():
        try:
            desc = con.sql("DESCRIBE " + sql).fetchall()
        except Exception as e:  # a malformed oracle would fail the gate too
            offenders[name] = f"DESCRIBE failed: {e}"
            continue
        huge = [(c, ty) for c, ty, *_ in desc if "HUGEINT" in ty.upper()]
        if huge:
            offenders[name] = huge
    assert not offenders, (
        "oracle SQL must CAST integer aggregates to BIGINT (DuckDB "
        f"HUGEINT hashes as a double in the driver gate): {offenders}"
    )
