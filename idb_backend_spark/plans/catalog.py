"""The demo catalog — every operator from SURVEY §2 registered as a
driver-gradable (query, oracle) pair.

This module is the aggregation point: importing it registers every entry
in the topic modules (side-effect registration through the @query
decorator in plans.registry) and re-exports the registry surface the
driver contract (__spark_entry__) reads. The synthetic-input SQL
builders shared across modules live in plans.synth.
"""

from __future__ import annotations

from idb_backend_spark.plans.registry import ORACLE, Q, _t, query  # noqa: F401
from idb_backend_spark.plans import (  # noqa: F401  (side-effect registration)
    q_enrichment,
    q_relational,
    q_shim,
    q_store,
    q_textsim,
)
