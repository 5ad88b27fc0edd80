from . import (
    analytics,
    etl,
    ingest_queries,
    llm_queries,
    materialize,
    scd,
    scd_queries,
    warehouse,
)

__all__ = [
    "analytics",
    "etl",
    "ingest_queries",
    "llm_queries",
    "materialize",
    "scd",
    "scd_queries",
    "warehouse",
]
