"""ETL cleaning pipelines (filled in by the ETL milestone)."""
