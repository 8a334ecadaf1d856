"""§2B-J: Structured Streaming queries (filled in stage 4)."""

from __future__ import annotations
