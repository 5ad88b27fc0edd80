"""Per-query Spark JOB count census (VERDICT r15 #7 / round 16): runs
every registered query at $SPARK_GRAFT_SF_DIR (default sf0.1) in
registry order in ONE session — the bench's execution shape — and
records how many Spark jobs each query's construction + count() pays,
net of shared-cache builds (builds are forced inside get_or_build, so
their jobs land on the family head exactly as the bench attributes
them; the census records build jobs separately). Fixed overhead at
local scale is mostly per-job (AQE stage submission + scheduling), so
the job count is the structural proxy for the sub-second queries'
aggregate cost. Writes tools/job_census.json.

Usage: python tools/job_census.py [out_path]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_warehouse_implementation_spark import registry  # noqa: E402
from data_warehouse_implementation_spark.plans import materialize  # noqa: E402
from data_warehouse_implementation_spark.session import get_spark, load_tables  # noqa: E402


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "job_census.json"
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="job-census")
    spark.sparkContext.setLogLevel("ERROR")
    for wdf in load_tables(spark, sf_dir).values():
        wdf.groupBy().count().collect()
    st = spark.sparkContext.statusTracker()
    qs = registry.queries()
    census: dict[str, dict] = {}
    for name, q in qs.items():
        b0 = len(materialize.BUILD_LOG)
        j0 = len(st.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        try:
            q(spark, sf_dir).count()
        except Exception as e:
            census[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            continue
        dt = time.perf_counter() - t0
        j1 = len(st.getJobIdsForGroup(None) or [])
        census[name] = {
            "jobs": j1 - j0,
            "sec": round(dt, 3),
            "built": materialize.BUILD_LOG[b0:],
        }
    rows = [(v["jobs"], v["sec"], k) for k, v in census.items() if "jobs" in v]
    total_jobs = sum(r[0] for r in rows)
    print(f"# {len(rows)} queries, {total_jobs} jobs total", file=sys.stderr)
    for j, s, k in sorted(rows, reverse=True)[:25]:
        print(f"# {k}: {j} jobs {s}s", file=sys.stderr)
    with open(out_path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "total_jobs": total_jobs, "queries": census}, fh, indent=1, sort_keys=True)
    print(json.dumps({"total_jobs": total_jobs, "n": len(rows)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
