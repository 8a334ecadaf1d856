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
    status: str  # loaded | failed
    at: str


class IngestLedger:
    """Append-only JSONL ledger keyed by content checksum."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._loaded: set[str] = set()
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    e = json.loads(line)
                    if e.get("status") == "loaded":
                        self._loaded.add(e["checksum"])

    def already_loaded(self, checksum: str) -> bool:
        return checksum in self._loaded

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
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(entry.__dict__) + "\n")
        if status == "loaded":
            self._loaded.add(checksum)
