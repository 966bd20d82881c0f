"""Grading-window rotation invariants.

The driver grades the first 50 entries of ``queries()``. Round 4 showed
what goes wrong when ordering is implicit: three new entries registered
past position 50 and were never driver-graded. These tests make the
rotation rule structural:

  every catalog entry with no green row in the previous round's
  CORRECTNESS artifact (which includes every newly added entry) must
  register inside the first 50 slots.
"""

from __future__ import annotations

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _latest_correctness() -> dict:
    arts = [
        f
        for f in os.listdir(REPO)
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
    ]
    # numeric round order (lexicographic misreads r100 < r99 / unpadded r5)
    arts.sort(key=lambda f: int(re.search(r"r(\d+)", f).group(1)))
    assert arts, "no CORRECTNESS artifact in repo root"
    with open(os.path.join(REPO, arts[-1])) as fh:
        return json.load(fh)


def _green(row) -> bool:
    # fully green only: a rows-only match with a failed value hash is a
    # real failure (precedent: collection_counts_pivot in r1) and must
    # re-enter the grading window
    return (
        isinstance(row, dict)
        and bool(row.get("rows_match"))
        and bool(row.get("schema_match"))
        and bool(row.get("hash_match"))
    )


def test_ungraded_entries_lead_registration():
    from idb_backend_spark.plans.catalog import Q

    prev = _latest_correctness()
    graded_green = {name for name, row in prev.items() if _green(row)}
    names = list(Q)
    window = set(names[:WINDOW])
    missing = [
        n for n in names if n not in graded_green and n not in window
    ]
    assert not missing, (
        f"entries with no prior green row must register inside the first "
        f"{WINDOW} slots, but these landed outside: {missing}"
    )


def test_front_list_fits_window():
    from idb_backend_spark.plans import catalog

    front = [n for n in catalog._GRADE_FRONT if n in catalog.Q]
    assert len(front) <= WINDOW
    names = list(catalog.Q)
    assert names[: len(front)] == front


def test_oracle_keys_subset_and_ungraded_disjoint():
    from idb_backend_spark.plans.catalog import ORACLE, Q, UNGRADED

    assert set(ORACLE) <= set(Q)
    assert not (set(UNGRADED) & set(Q))
    # The two rows-only sketches stay runnable outside the graded set.
    assert {"minhash_lsh_pairs", "simhash_pairs"} <= set(UNGRADED)


def test_front_is_the_artifact_complement():
    """The computed front must be exactly the entries with no green row
    in the latest artifact — the property that makes the rotation
    self-maintaining (no hand-flipped list to go stale)."""
    from idb_backend_spark.plans.catalog import Q, _GRADE_FRONT

    prev = _latest_correctness()
    green = {name for name, row in prev.items() if _green(row)}
    assert set(_GRADE_FRONT) == set(Q) - green


def test_readme_count_matches_catalog():
    """README's graded-entry count is a tested assertion, not prose —
    round-5 verdict flagged it stale at '92' when the catalog held 100."""
    from idb_backend_spark.plans.catalog import ORACLE, Q, UNGRADED

    assert len(ORACLE) == len(Q)
    with open(os.path.join(REPO, "README.md")) as fh:
        readme = fh.read()
    m = re.search(r"(\d+) graded demonstration queries", readme)
    assert m, "README no longer states the graded-entry count"
    assert int(m.group(1)) == len(Q), (
        f"README says {m.group(1)} graded queries; catalog has {len(Q)}"
    )
    m2 = re.search(r"\+(\d+) ungraded", readme)
    assert m2 and int(m2.group(1)) == len(UNGRADED)
