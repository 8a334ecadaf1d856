"""Structured Streaming: the engine's continuous-ingest surface.

The reference runs a daily batch (yesterday->today window,
/root/reference/fresh_picked_leads.py:140-154); these modules are that
cadence generalized to continuous micro-batch processing per SURVEY.md
§2B-J.  Batch/stream parity is the design rule: every streaming query
here has a batch-expressible equivalent that the DuckDB oracle (or a
rows-only invariant test) checks via ``availableNow`` replay over the
static events table.
"""

from .source import events_stream
from .runner import run_available_now

__all__ = ["events_stream", "run_available_now"]
