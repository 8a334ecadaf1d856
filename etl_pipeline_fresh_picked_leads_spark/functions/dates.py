"""Date parameterization — the reference's window math as engine
functions.

Reference parity: ``get_custom_dates()`` builds a yesterday->today
fetch window formatted %m%d / %d
(/root/reference/fresh_picked_leads.py:140-154); DATE literals feed
the ingestion-date UPDATE (/root/reference/big_uery_handler.py:95,190).
"""

from __future__ import annotations

from datetime import date, timedelta

from pyspark.sql import Column
from pyspark.sql import functions as F


def fetch_window(today: date | None = None) -> tuple[date, date]:
    """(yesterday, today) — the reference's daily fetch range
    (fresh_picked_leads.py:146-149)."""
    t = today or date.today()
    return t - timedelta(days=1), t


def fmt_mmdd(col: Column) -> Column:
    """%m%d format (fresh_picked_leads.py:152)."""
    return F.date_format(col, "MMdd")


def fmt_dd(col: Column) -> Column:
    """%d format (fresh_picked_leads.py:153)."""
    return F.date_format(col, "dd")


def date_literal(d: date) -> Column:
    """DATE '<d>' literal (big_uery_handler.py:95,190)."""
    return F.lit(str(d)).cast("date")
