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
# driver grades the first 50 registered entries).  Round 3 graded q_store
# + q_textsim + q_shim + the first 17 of q_enrichment; round 4 rotates the
# complement forward so every entry is driver-graded in r3∪r4: the new
# round-4 entries (q_parity), all of q_enrichment (includes rev_geocode,
# changed this round), all of q_relational (last graded r2, includes
# sibling_symmetrize, changed this round), then q_shim with shim_fulltext
# (changed this round) registered first inside the module so it lands at
# position ≤50.
from idb_backend_spark.plans import (  # noqa: F401  (side-effect registration)
    q_parity,
    q_enrichment,
    q_relational,
    q_shim,
    q_store,
    q_textsim,
)
