"""Shared fixtures: one session, one hand-crafted archive exercising the
edge cases the reference's fixture builder covers
(internal/query/testfixtures_test.go): email vs chat senders, empty
senders, multi-recipient fan-out, soft-deleted rows, labels, attachments.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import SparkSession

from msgvault_spark.sources.loader import ARCHIVE_SCHEMAS


@pytest.fixture(scope="session", autouse=True)
def _artifact_tmp(tmp_path_factory):
    """Keep test runs hermetic: the on-disk artifact lake
    (sources/artifact_store.py) writes to a per-run tmp dir instead of the
    repo-default .artifacts, so one run's artifacts never leak into the
    next run's build-vs-load behavior."""
    import os

    if "SPARK_GRAFT_ARTIFACT_DIR" not in os.environ:
        os.environ["SPARK_GRAFT_ARTIFACT_DIR"] = str(
            tmp_path_factory.mktemp("artifacts")
        )
    yield


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("msgvault_tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    yield s


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="session")
def archive(spark):
    """Six messages:
      1 email  alice→bob           2024-01, INBOX,   100B, 1 attachment(10B)
      2 email  alice→bob,carol(cc) 2024-02, INBOX+Work, 200B
      3 email  bob→alice           2024-02, SENT,    300B, 2 attachments(5,15)
      4 chat   (sender_id=carol)   2024-03, no labels, 50B, whatsapp
      5 email  no sender rows      2024-03, no labels, 75B  (empty-sender)
      6 email  alice→bob           2023-12, deleted_at set → always hidden
    Participants: alice(a@x.com, X Corp), bob(b@y.com, phone +1555),
    carol(phone-only +2666, no email).
    """
    msgs = [
        # id, src, smid, conv, subject, snippet, sent_at, size, has_att,
        # att_count, deleted_from_source_at, sender_id, mtype, year, month
        (1, 1, "m1", 10, "Hello world", "hi", ts("2024-01-15T10:00:00"), 100,
         True, 1, None, None, "email", 2024, 1),
        (2, 1, "m2", 10, "Project plan", "plan", ts("2024-02-01T09:00:00"),
         200, False, 0, None, None, "email", 2024, 2),
        (3, 2, "m3", 11, "Re: Hello", "re", ts("2024-02-20T12:00:00"), 300,
         True, 2, None, None, "email", 2024, 2),
        (4, 3, "m4", 12, None, "yo", ts("2024-03-05T08:00:00"), 50, False, 0,
         None, 3, "whatsapp", 2024, 3),
        (5, 1, "m5", 13, "Orphan", "orphan", ts("2024-03-10T11:00:00"), 75,
         False, 0, None, None, "email", 2024, 3),
    ]
    deleted = [
        (6, 1, "m6", 10, "Old", "old", ts("2023-12-01T00:00:00"), 10, False,
         0, None, None, "email", 2023, 12),
    ]
    messages = spark.createDataFrame(
        msgs + deleted, schema=ARCHIVE_SCHEMAS["messages"]
    )
    # soft-delete only id 6 (deleted_at column added on top of schema)
    from pyspark.sql import functions as F

    messages = messages.withColumn(
        "deleted_at",
        F.when(F.col("id") == 6, F.lit(ts("2024-01-01T00:00:00"))).cast(
            "timestamp"
        ),
    )

    recipients = spark.createDataFrame(
        [
            (1, 1, "from", ""), (1, 2, "to", ""),
            (2, 1, "from", "Alice Override"), (2, 2, "to", ""), (2, 3, "cc", ""),
            (3, 2, "from", ""), (3, 1, "to", ""),
            (6, 1, "from", ""), (6, 2, "to", ""),
        ],
        schema=ARCHIVE_SCHEMAS["message_recipients"],
    )
    participants = spark.createDataFrame(
        [
            (1, "a@x.com", "x.com", "X Corp", ""),
            (2, "b@y.com", "y.com", "", "+1555"),
            (3, "", "", "", "+2666"),
        ],
        schema=ARCHIVE_SCHEMAS["participants"],
    )
    labels = spark.createDataFrame(
        [(1, "INBOX"), (2, "SENT"), (3, "Work")],
        schema=ARCHIVE_SCHEMAS["labels"],
    )
    message_labels = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 3), (3, 2), (6, 1)],
        schema=ARCHIVE_SCHEMAS["message_labels"],
    )
    attachments = spark.createDataFrame(
        [
            (1, 10, "a.pdf", 101, "application/pdf", "h-a"),
            (3, 5, "b.png", 301, "image/png", "h-b"),
            (3, 15, "c.zip", 302, "application/zip", "h-c"),
            # dangling message_id (no such message) with NULL metadata:
            # exercises GetAttachment's COALESCE defaults without touching
            # any per-message attachment sum other tests pin
            (99, None, None, 901, None, None),
        ],
        schema=ARCHIVE_SCHEMAS["attachments"],
    )
    conversations = spark.createDataFrame(
        [(10, "t10", ""), (11, "t11", ""), (12, "t12", "Fun chat"),
         (13, "t13", "")],
        schema=ARCHIVE_SCHEMAS["conversations"],
    )
    return {
        "messages": messages,
        "message_recipients": recipients,
        "participants": participants,
        "labels": labels,
        "message_labels": message_labels,
        "attachments": attachments,
        "conversations": conversations,
    }
