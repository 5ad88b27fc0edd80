"""data_warehouse_implementation_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of the reference
project ``taimoor-9-6/data-warehouse-implementation`` (an end-to-end
dimensional data warehouse: pandas ETL -> PostgreSQL star schema with
SCD1/2/3 trigger machinery -> analytical SQL), built Spark-first:

- ``session``    : SparkSession bootstrap + testdata table registry
- ``sources``    : readers (csv / parquet / json / nested-doc flatten) and sinks
- ``functions``  : scalar/column helpers (null canonicalization, flag
                   encoding, safe ratios, date decomposition)
- ``operators``  : relational building blocks (dedup, top-k, semi-join
                   filters, reshape, imputation) plus LLM-data-pipeline
                   operators (near-dup detection, similarity search,
                   text analysis, multimodal column plumbing)
- ``plans``      : the dimensional model (build_dim / build_fact /
                   build_warehouse), SCD batch algebra, the analytics
                   query library, and the ETL cleaning pipelines
- ``streaming``  : Structured Streaming extension (incremental SCD via
                   foreachBatch, watermarked windowed aggregates)

Everything is public-API PySpark (DataFrame / Spark SQL); there are no
custom Catalyst rules — the engine's value is the operator semantics,
the dimensional/SCD algebra, and scale-aware physical layout choices
(broadcast dims, partitioned facts, AQE).
"""

__version__ = "0.1.0"
