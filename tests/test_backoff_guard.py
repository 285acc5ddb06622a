"""The backoff broadcast guard (r13): the cb/cu count tables broadcast
only while they fit BROADCAST_MAX_ROWS — above it the scoring joins fall
back to sort-merge (shuffle) joins, so a pathological ref_pred can never
build an unbounded driver-side broadcast. Results must be identical in
both modes (join strategy only)."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401 (plan helpers)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "ref"),
        (2, "the quick brown fox naps under the old tree", "ref"),
        (3, "quick brown foxes jump over lazy dogs daily", "raw"),
        (4, "zx qv wq pl mn bv", "raw"),  # fully unseen → pure backoff
        (5, "the the the the", "raw"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_guard_modes_same_rows_different_join(spark, monkeypatch):
    from msgvault_spark.textstats import backoff

    docs = _docs(spark)

    bcast_df = backoff.bigram_backoff_scores(docs, "source = 'ref'")
    bcast_plan = bcast_df._jdf.queryExecution().executedPlan().toString()
    got_bcast = sorted(map(tuple, bcast_df.collect()))

    monkeypatch.setattr(backoff, "BROADCAST_MAX_ROWS", 0)
    smj_df = backoff.bigram_backoff_scores(docs, "source = 'ref'")
    smj_plan = smj_df._jdf.queryExecution().executedPlan().toString()
    got_smj = sorted(map(tuple, smj_df.collect()))

    # broadcast mode: all three count-table joins are broadcast hash joins
    assert "BroadcastHashJoin" in bcast_plan
    assert "SortMergeJoin" not in bcast_plan
    # guarded mode: the count-table joins are sort-merge; only the 1-row
    # totals frame still broadcasts (always bounded)
    assert "SortMergeJoin" in smj_plan
    # identical results — the guard changes join strategy, never values
    assert got_smj == got_bcast
    assert len(got_bcast) == 5  # every doc here has >= 2 tokens
