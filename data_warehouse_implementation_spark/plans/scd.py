"""SCD batch algebra (filled in by the warehouse milestone)."""
