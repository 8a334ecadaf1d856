"""Identifier normalization.

Reference parity: table identity is the file stem, lower-cased
(/root/reference/big_uery_handler.py:74-75).
"""

from __future__ import annotations

import os
import re


def table_name_for_file(file_name: str) -> str:
    """File -> table name (stem, lower-cased; big_uery_handler.py:74)."""
    return os.path.splitext(os.path.basename(file_name))[0].lower()


def normalize_identifier(name: str) -> str:
    """Catalog-safe identifier: lower-case, non-alnum -> underscore,
    no leading digit."""
    out = re.sub(r"[^a-z0-9_]", "_", name.strip().lower())
    return f"t_{out}" if out and out[0].isdigit() else out
