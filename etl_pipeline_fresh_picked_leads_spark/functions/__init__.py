"""Reusable column-level function helpers.

- ``dates``  — the reference's date-window parameterization (R2/R15)
- ``names``  — file/table name normalization (R4)
"""

from .dates import date_literal, fetch_window, fmt_dd, fmt_mmdd
from .names import normalize_identifier, table_name_for_file

__all__ = [
    "date_literal",
    "fetch_window",
    "fmt_dd",
    "fmt_mmdd",
    "normalize_identifier",
    "table_name_for_file",
]
