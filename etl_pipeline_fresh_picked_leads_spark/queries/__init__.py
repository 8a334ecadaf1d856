"""Named query registry — the driver-checked contract (SURVEY.md §2B).

Each query ID maps to a callable ``(spark, sf_dir) -> DataFrame`` and,
where the semantics are exactly SQL-expressible, a DuckDB oracle SQL
string over the pre-registered views (region nation customer supplier
part orders lineitem events documents embeddings).  Hash-stability
conventions (SURVEY.md §2B note):

- every computed column is aliased identically on both sides;
- floating-point aggregates go through exact decimal accumulation
  (``helpers.dsum``) or explicit rounding on BOTH sides;
- every LIMIT / top-k query breaks ties with a unique key.
"""

from __future__ import annotations

from .registry import ORACLE, QUERIES

# Importing the category modules populates the registry.
from . import scans  # noqa: E402,F401
from . import filters  # noqa: E402,F401
from . import joins  # noqa: E402,F401
from . import aggregates  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import sorts  # noqa: E402,F401
from . import setops  # noqa: E402,F401
from . import scalars  # noqa: E402,F401
from . import udfs  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from . import extensions  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE"]
