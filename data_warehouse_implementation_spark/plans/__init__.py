from . import analytics, etl, scd, warehouse

__all__ = ["analytics", "etl", "scd", "warehouse"]
