from . import calendar, imputation, relational, reshape

__all__ = ["calendar", "imputation", "relational", "reshape"]
