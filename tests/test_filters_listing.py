"""MessageFilter semi/anti-join semantics + two-phase listing."""

from msgvault_spark.plans.filters import apply_message_filter
from msgvault_spark.plans.listing import list_messages, list_with_labels
from msgvault_spark.plans.models import (
    MessageFilter,
    MessageSort,
    MessageSortField,
    Pagination,
    SortDirection,
    ViewType,
)


def ids(df):
    return sorted(r["id"] for r in df.collect())


def test_sender_filter_dual_path(archive):
    # email path: alice
    assert ids(apply_message_filter(archive, MessageFilter(sender="a@x.com"))) == [1, 2]
    # chat path: carol by phone → message 4 via sender_id
    assert ids(apply_message_filter(archive, MessageFilter(sender="+2666"))) == [4]
    # bob by phone matches his from-row too
    assert ids(apply_message_filter(archive, MessageFilter(sender="+1555"))) == [3]


def test_empty_sender_target(archive):
    f = MessageFilter(empty_value_targets={ViewType.SENDERS})
    assert ids(apply_message_filter(archive, f)) == [5]


def test_recipient_and_names(archive):
    assert ids(apply_message_filter(archive, MessageFilter(recipient="b@y.com"))) == [1, 2]
    f = MessageFilter(recipient_name="+2666")  # carol's name = phone
    assert ids(apply_message_filter(archive, f)) == [2]
    f2 = MessageFilter(empty_value_targets={ViewType.RECIPIENTS})
    assert ids(apply_message_filter(archive, f2)) == [4, 5]


def test_label_filter_case_insensitive(archive):
    assert ids(apply_message_filter(archive, MessageFilter(label="inbox"))) == [1, 2]
    f = MessageFilter(empty_value_targets={ViewType.LABELS})
    assert ids(apply_message_filter(archive, f)) == [4, 5]


def test_time_period_inference(archive):
    assert ids(apply_message_filter(archive, MessageFilter(time_period="2024"))) == [1, 2, 3, 4, 5]
    assert ids(apply_message_filter(archive, MessageFilter(time_period="2024-02"))) == [2, 3]
    assert ids(apply_message_filter(archive, MessageFilter(time_period="2024-01-15"))) == [1]


def test_empty_source_list_matches_nothing(archive):
    assert ids(apply_message_filter(archive, MessageFilter(source_ids=[]))) == []


def test_listing_decoration_and_order(archive):
    out = list_messages(archive, MessageFilter()).collect()
    assert [r["id"] for r in out] == [5, 4, 3, 2, 1]  # date desc, id desc
    by_id = {r["id"]: r for r in out}
    # per-message display override beats participant fields (msg 2)
    assert by_id[2]["from_name"] == "Alice Override"
    assert by_id[1]["from_name"] == "X Corp"
    # chat sender resolved through sender_id (msg 4: carol, phone-only)
    assert by_id[4]["from_phone"] == "+2666"
    assert by_id[4]["from_email"] == ""
    # orphan message: all sender fields empty
    assert by_id[5]["from_email"] == "" and by_id[5]["from_name"] == ""
    # conversation decoration
    assert by_id[4]["conv_title"] == "Fun chat"


def test_listing_pagination_offset(archive):
    f = MessageFilter(
        sorting=MessageSort(MessageSortField.DATE, SortDirection.DESC),
        pagination=Pagination(limit=2, offset=1),
    )
    out = list_messages(archive, f).collect()
    assert [r["id"] for r in out] == [4, 3]


def test_listing_sort_by_size_asc(archive):
    f = MessageFilter(
        sorting=MessageSort(MessageSortField.SIZE, SortDirection.ASC)
    )
    out = list_messages(archive, f).collect()
    assert [r["id"] for r in out] == [4, 5, 1, 2, 3]


def test_list_with_labels(archive):
    out = {r["id"]: r for r in list_with_labels(archive, MessageFilter()).collect()}
    assert out[2]["labels"] == ["INBOX", "Work"]
    assert out[4]["labels"] == []
