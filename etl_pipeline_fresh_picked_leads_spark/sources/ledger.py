"""Ingestion ledger: exactly-once file loads.

The reference's only record of "this file was loaded" is deleting the
file — including when the load FAILED
(/root/reference/big_uery_handler.py:84-89), which both loses data and
can't prevent double-loads of a re-landed file.  SURVEY §4.3 calls for
an explicit ledger instead: a small table keyed by content checksum
recording every load attempt.  ``ingest_directory(ledger=...)``
consults it so re-landing the same bytes (retries, upstream replays,
backfills) is a no-op — exactly-once semantics across runs, which at
100 TB is what makes blind re-runs of a failed day safe.

The ledger is file-backed (one JSON line per event) rather than a
Spark table: it is driver-side metadata, tiny (one row per file ever
loaded), and must be readable/appendable without a SparkSession; a
production deployment would point this at a transactional store.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
from dataclasses import dataclass
from datetime import datetime, timezone


def file_checksum(path: str) -> str:
    """Content checksum (sha256) — identity of the *bytes*, so a
    renamed or re-landed copy of the same file is recognized."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


@dataclass
class LedgerEntry:
    checksum: str
    file_name: str
    table: str
    status: str  # loading | loaded | failed
    at: str


class IngestLedger:
    """Append-only JSONL ledger keyed by content checksum.
    Thread-safe (ingest_directory loads tables concurrently).

    Every load writes a ``loading`` intent entry BEFORE the Spark
    append and a ``loaded``/``failed`` entry after.  A crash between
    the append's commit and the ``loaded`` record therefore leaves a
    dangling intent instead of silently re-loading on rerun:
    ``pending()`` surfaces those checksums, ``ingest_directory`` skips
    them and reports them for reconciliation (check whether the rows
    made it into the target table, then ``record`` a terminal status
    by hand)."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._lock = threading.Lock()
        self._last: dict[str, str] = {}  # checksum -> last status
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    e = json.loads(line)
                    self._last[e["checksum"]] = e.get("status", "")

    def already_loaded(self, checksum: str) -> bool:
        return self._last.get(checksum) == "loaded"

    def pending(self, checksum: str | None = None):
        """Dangling ``loading`` intents (a crash window to reconcile).
        With an argument: is that checksum pending?  Without: the set
        of all pending checksums."""
        if checksum is not None:
            return self._last.get(checksum) == "loading"
        return {c for c, s in self._last.items() if s == "loading"}

    def record(
        self, checksum: str, file_name: str, table: str, status: str
    ) -> None:
        entry = LedgerEntry(
            checksum=checksum,
            file_name=file_name,
            table=table,
            status=status,
            at=datetime.now(timezone.utc).isoformat(),
        )
        with self._lock:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "a") as f:
                f.write(json.dumps(entry.__dict__) + "\n")
                f.flush()
                os.fsync(f.fileno())
            self._last[checksum] = status
