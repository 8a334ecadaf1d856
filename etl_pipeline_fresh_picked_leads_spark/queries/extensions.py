"""§2B-K: LLM-data-pipeline extension queries (filled in stage 5)."""

from __future__ import annotations
