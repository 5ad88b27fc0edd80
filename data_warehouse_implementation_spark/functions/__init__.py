from .scalar import (
    canonicalize_nulls,
    date_parts,
    flag_ratio,
    null_safe_ne,
    ratio,
    yes_no_to_int,
)

__all__ = [
    "canonicalize_nulls",
    "date_parts",
    "flag_ratio",
    "null_safe_ne",
    "ratio",
    "yes_no_to_int",
]
