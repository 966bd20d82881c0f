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

# Import order IS registration order IS the driver's grading order (the
# driver grades the first 50 registered entries).  Rounds 1-2 graded
# q_enrichment + q_relational + q_shim; round 3 rotates q_store and
# q_textsim to the front so the source/sink round-trips and the whole
# similarity tier earn driver-green rows.  Entries changed this round
# (shim_fulltext token semantics, rev_geocode EEZ layer) stay inside the
# window via q_shim / q_enrichment following immediately after.
from idb_backend_spark.plans import (  # noqa: F401  (side-effect registration)
    q_store,
    q_textsim,
    q_shim,
    q_enrichment,
    q_relational,
)
