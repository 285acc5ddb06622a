"""Aggregate-view semantics on the hand-crafted archive."""

from msgvault_spark.plans import aggregate as agg
from msgvault_spark.plans.models import (
    AggregateOptions,
    MessageFilter,
    SortDirection,
    SortField,
    TimeGranularity,
    ViewType,
)


def rows_by_key(df):
    return {r["key"]: r for r in df.collect()}


def test_senders(archive):
    out = rows_by_key(agg.aggregate(archive, ViewType.SENDERS))
    # alice sent 1,2 (deleted 6 excluded); bob sent 3; chat msg 4 has no
    # 'from' row; orphan 5 has none
    assert set(out) == {"a@x.com", "b@y.com"}
    a = out["a@x.com"]
    assert a["count"] == 2
    assert a["total_size"] == 300
    assert a["attachment_size"] == 10
    assert a["attachment_count"] == 1
    assert a["total_unique"] == 2
    b = out["b@y.com"]
    assert b["count"] == 1 and b["total_size"] == 300
    assert b["attachment_size"] == 20 and b["attachment_count"] == 2


def test_sender_names_fallback_chain(archive):
    out = rows_by_key(agg.aggregate(archive, ViewType.SENDER_NAMES))
    # alice → display name; bob → phone (no display name)
    assert set(out) == {"X Corp", "+1555"}


def test_recipients_multiplicity(archive):
    out = rows_by_key(agg.aggregate(archive, ViewType.RECIPIENTS))
    # bob received 1,2; alice received 3; carol cc'd on 2 but has no email →
    # email key is '' (empty string is NOT filtered — only NULL is)
    assert out["b@y.com"]["count"] == 2
    assert out["a@x.com"]["count"] == 1
    assert out[""]["count"] == 1  # carol's empty email surfaces as ''


def test_domains(archive):
    out = rows_by_key(agg.aggregate(archive, ViewType.DOMAINS))
    assert out["x.com"]["count"] == 2
    assert out["y.com"]["count"] == 1


def test_labels(archive):
    out = rows_by_key(agg.aggregate(archive, ViewType.LABELS))
    # deleted msg 6 contributes nothing; INBOX on 1,2; Work on 2; SENT on 3
    assert out["INBOX"]["count"] == 2
    assert out["Work"]["count"] == 1
    assert out["SENT"]["count"] == 1


def test_time_views(archive):
    opts = AggregateOptions(
        sort_field=SortField.NAME, sort_direction=SortDirection.ASC
    )
    months = rows_by_key(agg.aggregate(archive, ViewType.TIME, opts))
    assert set(months) == {"2024-01", "2024-02", "2024-03"}
    assert months["2024-02"]["count"] == 2
    opts.time_granularity = TimeGranularity.DAY
    days = rows_by_key(agg.aggregate(archive, ViewType.TIME, opts))
    assert "2024-01-15" in days
    opts.time_granularity = TimeGranularity.YEAR
    years = rows_by_key(agg.aggregate(archive, ViewType.TIME, opts))
    assert years["2024"]["count"] == 5


def test_soft_delete_always_hidden(archive):
    for view in ViewType:
        out = agg.aggregate(archive, view).collect()
        # message 6 (deleted_at set) must never contribute: its subject-only
        # label INBOX count stays 2, sender counts stay 2
        if view == ViewType.LABELS:
            assert {r["key"]: r["count"] for r in out}["INBOX"] == 2


def test_sub_aggregate_domain_to_labels(archive):
    out = rows_by_key(
        agg.sub_aggregate(
            archive, ViewType.LABELS, MessageFilter(domain="x.com")
        )
    )
    # messages from x.com senders: 1,2 → labels INBOX(2), Work(1)
    assert out == {k: out[k] for k in ("INBOX", "Work")}
    assert out["INBOX"]["count"] == 2 and out["Work"]["count"] == 1


def test_total_stats(archive):
    r = agg.total_stats(archive).collect()[0]
    assert r["message_count"] == 5
    assert r["total_size"] == 100 + 200 + 300 + 50 + 75
    assert r["attachment_count"] == 3
    assert r["attachment_size"] == 30
    assert r["account_count"] == 3
    assert r["label_count"] == 3


def test_sort_and_limit_deterministic(archive):
    opts = AggregateOptions(limit=1, sort_field=SortField.COUNT,
                            sort_direction=SortDirection.DESC)
    top = agg.aggregate(archive, ViewType.SENDERS, opts).collect()
    assert len(top) == 1 and top[0]["key"] == "a@x.com"
    # total_unique still reflects ALL groups, not the limited page
    assert top[0]["total_unique"] == 2
