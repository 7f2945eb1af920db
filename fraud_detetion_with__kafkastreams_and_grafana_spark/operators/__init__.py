from .detect import (
    FRAUD_THRESHOLD,
    branch_fraud,
    events_as_transactions,
    parse_wire,
    serialize_wire,
)

__all__ = [
    "FRAUD_THRESHOLD",
    "branch_fraud",
    "events_as_transactions",
    "parse_wire",
    "serialize_wire",
]
