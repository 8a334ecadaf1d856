"""Physical-plan introspection helpers (scale hygiene checks)."""

from .explain import (
    formatted_plan,
    has_broadcast_join,
    has_pushed_filters,
    has_take_ordered,
    has_wholestage_codegen,
    n_exchanges,
    n_exchanges_in,
)

__all__ = [
    "formatted_plan",
    "has_broadcast_join",
    "has_pushed_filters",
    "has_take_ordered",
    "has_wholestage_codegen",
    "n_exchanges",
    "n_exchanges_in",
]
