from . import (
    calendar,
    dedup,
    imputation,
    multimodal,
    relational,
    reshape,
    similarity,
    text,
)

__all__ = [
    "calendar",
    "dedup",
    "imputation",
    "multimodal",
    "relational",
    "reshape",
    "similarity",
    "text",
]
