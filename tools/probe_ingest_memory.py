"""Measure the cogrouped ingest kernel's per-row memory cost (verdict
r12 task 5): the kernel holds ONE recordset's rows + lookup dicts in a
single pandas group (operators/ingest._process_group), so the router
threshold ``kernel_max_rows`` must come from measured bytes/row, not a
round number.

Runs _process_group standalone in a SUBPROCESS per size (ru_maxrss is
process-lifetime max, so each measurement needs a fresh process):
build a representative group (10 CURIE terms x ~15-char values per
row, 20% of rows seeded as existing children in the lookup), run the
kernel, report peak RSS minus the post-import baseline. The measured
figure covers the pandas group + the kernel's per-recordset dicts +
the outcome rows — the same resident set an executor's Python worker
holds for one Arrow group (the Arrow batch itself adds one more copy
of the input during conversion; the subprocess path includes the
pandas frame, which is the larger of the two).

Usage: python tools/probe_ingest_memory.py [sizes...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, resource, sys
sys.path.insert(0, "/root/repo")
n = int(sys.argv[1])

import pandas as pd
from idb_backend_spark.functions.etags import calc_etag
from idb_backend_spark.operators.ingest import _process_group

base_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

TERMS = [
    "dwc:occurrenceID", "dwc:catalogNumber", "dwc:collectionCode",
    "dwc:recordedBy", "dwc:scientificName", "dwc:locality",
    "dwc:decimalLatitude", "dwc:decimalLongitude", "dcterms:modified",
    "dwc:basisOfRecord",
]
rows = pd.DataFrame(
    {
        "rsid": "rs-mem",
        "file_order": 0,
        "fname": "occurrence.txt",
        "rowtype": "dwc:Occurrence",
        "seq": range(n),
        "rec": [
            [(t, f"{t[-6:]}-value-{i}") for t in TERMS] for i in range(n)
        ],
    }
)
built_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

# 20% of rows pre-exist (ident -> uuid -> etag), like a steady-state
# re-harvest; lookup dicts are part of the kernel's resident set
lk_rows = []
for i in range(0, n, 5):
    rec = {t: f"{t[-6:]}-value-{i}" for t in TERMS}
    lk_rows.append(
        (
            "rs-mem", "rs", "records",
            f"rs-mem\\occid-value-{i}".lower(), f"ex-{i}",
            calc_etag(rec), "rs-mem", False,
        )
    )
lookup = pd.DataFrame(
    lk_rows,
    columns=[
        "rsid", "scope", "rtype", "ident", "uuid", "etag", "parent",
        "deleted",
    ],
)
out = _process_group(rows, lookup, True, ("dwc:ResourceRelationship",))
peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print(
    json.dumps(
        {
            "n": n,
            "baseline_mb": round(base_kb / 1024, 1),
            "after_build_mb": round(built_kb / 1024, 1),
            "peak_mb": round(peak_kb / 1024, 1),
            "kernel_delta_mb": round((peak_kb - base_kb) / 1024, 1),
            "bytes_per_row": round((peak_kb - base_kb) * 1024 / n, 1),
            "out_rows": len(out),
        }
    )
)
"""


def main():
    sizes = [int(float(s)) for s in sys.argv[1:]] or [
        250_000, 1_000_000, 2_500_000, 5_000_000
    ]
    results = []
    for n in sizes:
        r = subprocess.run(
            [sys.executable, "-c", WORKER, str(n)],
            capture_output=True, text=True,
            env={**os.environ, "PYTHONPATH": "/root/repo"},
        )
        if r.returncode != 0:
            print(f"# n={n} FAILED: {r.stderr[-500:]}", file=sys.stderr)
            continue
        row = json.loads(r.stdout.strip().splitlines()[-1])
        results.append(row)
        print(json.dumps(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
