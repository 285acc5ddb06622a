"""The logical IR: view types, aggregate options, message filters.

The reference's IR is the Go struct triple ViewType + AggregateOptions +
MessageFilter (reference: internal/query/models.go:90-101,149-231,293-318) —
there is no AST of its own; structs compile to SQL. Here the same triple
compiles to DataFrame transformations and Catalyst does the rest.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from datetime import datetime


class ViewType(enum.Enum):
    """Aggregate dimensions (reference models.go:90-101)."""

    SENDERS = "senders"
    SENDER_NAMES = "sender_names"
    RECIPIENTS = "recipients"
    RECIPIENT_NAMES = "recipient_names"
    DOMAINS = "domains"
    LABELS = "labels"
    TIME = "time"


class TimeGranularity(enum.Enum):
    YEAR = "year"
    MONTH = "month"
    DAY = "day"


class SortField(enum.Enum):
    """Aggregate sort fields (reference models.go:149-180)."""

    COUNT = "count"
    SIZE = "total_size"
    ATTACHMENT_SIZE = "attachment_size"
    NAME = "key"


class SortDirection(enum.Enum):
    ASC = "asc"
    DESC = "desc"


class MessageSortField(enum.Enum):
    """Message-list sort fields (reference models.go:183-189)."""

    DATE = "sent_at"
    SIZE = "size_estimate"
    SUBJECT = "subject"


@dataclass
class MessageSort:
    field: MessageSortField = MessageSortField.DATE
    direction: SortDirection = SortDirection.DESC


@dataclass
class Pagination:
    limit: int = 500
    offset: int = 0


@dataclass
class AggregateOptions:
    """Options for the 7 aggregate views (reference models.go:293-318)."""

    limit: int = 100
    sort_field: SortField = SortField.COUNT
    sort_direction: SortDirection = SortDirection.DESC
    time_granularity: TimeGranularity = TimeGranularity.MONTH
    source_ids: list[int] | None = None
    after: datetime | None = None
    before: datetime | None = None
    with_attachments_only: bool = False
    hide_deleted_from_source: bool = False
    search_query: str = ""


@dataclass
class MessageFilter:
    """Drill-down filter (reference models.go:192-231). Equality filters
    become semi-joins; ``empty_value_targets`` become anti-joins
    (reference duckdb.go:844-1010)."""

    sender: str = ""
    sender_name: str = ""
    recipient: str = ""
    recipient_name: str = ""
    domain: str = ""
    label: str = ""
    time_period: str = ""  # '2024' | '2024-01' | '2024-01-15'
    time_granularity: TimeGranularity = TimeGranularity.YEAR
    after: datetime | None = None
    before: datetime | None = None
    with_attachments_only: bool = False
    source_ids: list[int] | None = None
    conversation_id: int | None = None
    hide_deleted_from_source: bool = False
    # drill into "(no sender)" / "(no label)" buckets (models.go:204-273)
    empty_value_targets: set[ViewType] = field(default_factory=set)
    sorting: MessageSort = field(default_factory=MessageSort)
    pagination: Pagination = field(default_factory=Pagination)


def infer_time_granularity(base: TimeGranularity, period: str) -> TimeGranularity:
    """Granularity from period string length (reference duckdb.go:1012-1023)."""
    if base == TimeGranularity.YEAR and len(period) > 4:
        if len(period) == 7:
            return TimeGranularity.MONTH
        if len(period) == 10:
            return TimeGranularity.DAY
    return base
