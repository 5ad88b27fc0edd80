"""Fixed-order fresh-process timing of the graph-walk queries
(pagerank, communities, kcore) for the round-16 edge-cache A/B.
Prints one JSON line. Usage: python tools/ab_graph.py"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_warehouse_implementation_spark import registry  # noqa: E402
from data_warehouse_implementation_spark.session import get_spark  # noqa: E402

NAMES = [
    "purchase_graph_pagerank",
    "purchase_graph_communities",
    "supplier_cosupply_kcore",
    "supplier_cosupply_triangles",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-graph")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    # neutral warmup: scan+agg each table (same as bench.py's first block)
    from data_warehouse_implementation_spark.session import load_tables

    for wdf in load_tables(spark, sf_dir).values():
        wdf.groupBy().count().collect()
    out = {}
    for name in NAMES:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        out[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {out[name]}s ({n} rows)", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
