"""Capture .explain("formatted") for catalog entries into plans/r15/.

Usage:
    python tools/capture_plans.py <suffix> [query ...]

Writes plans/r15/<query>_<suffix>.txt for each requested entry (all
headline + graded entries when none named). Driver-only — builds the
DataFrame and renders the plan, never executes a job, so it is cheap
and safe to run alongside other work.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

REPO = "/root/repo"
OUT = os.path.join(REPO, "plans", "r15")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    from idb_backend_spark.plans.catalog import Q, UNGRADED
    from idb_backend_spark.session import get_spark

    runnable = {**Q, **UNGRADED}
    if not names:
        names = list(runnable)
    os.makedirs(OUT, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("idb-backend-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        try:
            df = runnable[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # keep going; record the failure
            plan = f"ERROR building plan: {e!r}\n"
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
