"""Capture `.explain("formatted")` for registry queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py <tag> [query ...]   # default: all queries
Writes plans/<tag>/<query>.txt (driver-contract plan evidence for the
optimization rounds).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lantern_extras_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import __spark_entry__ as E

    tag = sys.argv[1]
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("lantern-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    names = sys.argv[2:] or list(qs)
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record the failure, keep going
            plan = f"PLAN CAPTURE FAILED: {exc!r}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
