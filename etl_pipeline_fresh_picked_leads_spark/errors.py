"""Error reporting hook.

Reference parity: ``log_exception()`` forwards exceptions to Sentry
(/root/reference/exception_logger.py:3-11, main.py:9-16).  The engine
keeps the same one-call surface with a pluggable reporter (default:
structured log record) so a Sentry/webhook integration is a one-line
registration, not a code change.
"""

from __future__ import annotations

import logging
import traceback
from collections.abc import Callable

log = logging.getLogger("etl_pipeline_fresh_picked_leads_spark.errors")

Reporter = Callable[[BaseException, str], None]

_reporters: list[Reporter] = []


def register_reporter(reporter: Reporter) -> None:
    """Add an external error sink (Sentry client, webhook poster...)."""
    _reporters.append(reporter)


def log_exception(exc: BaseException, context: str = "") -> None:
    """Record an exception locally and forward to every registered
    reporter (exception_logger.py:3-11 semantics: never raises)."""
    log.error(
        "exception%s: %s\n%s",
        f" in {context}" if context else "",
        exc,
        "".join(traceback.format_exception(exc)),
    )
    for reporter in _reporters:
        try:
            reporter(exc, context)
        except Exception:  # reporting must never break the pipeline
            log.warning("error reporter failed", exc_info=True)
