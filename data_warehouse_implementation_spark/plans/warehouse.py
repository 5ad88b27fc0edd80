"""Dimensional-model build pipeline (filled in by the warehouse milestone)."""
