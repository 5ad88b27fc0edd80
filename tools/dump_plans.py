"""Dump .explain("formatted") for selected registry queries into
plans/r16/<query>_<tag>.txt (optimization-round evidence files).

Usage: python tools/dump_plans.py <tag> <query> [<query> ...]
       python tools/dump_plans.py <tag> --all-top   # the round-16 watch list

Plans are the AQE initial plans (isFinalPlan=false) — the same shape the
exchange-budget lint reads. Shared-cache builds triggered while
constructing a query's frame run eagerly here exactly as in bench.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_warehouse_implementation_spark import registry  # noqa: E402
from data_warehouse_implementation_spark.session import get_spark  # noqa: E402

TOP = [
    "doc_language_model",
    "doc_language_confusion",
    "doc_substring_sa",
    "doc_substring_sa_hashed",
    "doc_substring_sa_dedup",
    "purchase_graph_pagerank",
    "purchase_graph_communities",
    "supplier_cosupply_kcore",
    "embedding_lsh_near_dup",
    "bloom_skipping_census",
    "containment_prefix_join",
    "near_dup_prefix_join",
    "near_dup_containment",
    "warehouse_fact_build",
    "corpus_curation_capped_funnel",
    "quantizer_distortion_compare",
    "embedding_ann_recall_matrix",
    "layout_advisor_report",
    "bpe_publish_encode",
    "doc_quality_pr_curve",
    "simhash_near_dup",
    "media_file_ingest",
    "hybrid_rrf_fusion",
    "nation_value_concentration_sql",
    "doc_substring_dup",
    "doc_substring_dedup",
]


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names == ["--all-top"]:
        names = TOP
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dwis-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name in names:
        if name not in qs:
            print(f"# unknown query: {name}", file=sys.stderr)
            continue
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"# {name}: {n_ex} Exchange nodes -> {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
