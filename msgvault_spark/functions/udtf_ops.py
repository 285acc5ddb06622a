"""Python UDTFs (table functions): one input row → many output rows with
imperative logic — the §2.12 surface member that pandas_udf (1→1 scalar)
and applyInPandas (group→frame) don't cover.

Spark 4 UDTFs run Arrow-batched like pandas UDFs. They are still the slow
path: use a JVM explode/split when the expansion rule is expressible (see
sentence_split_expr below — the same op as a pure column expression); reach
for the UDTF only when the per-row logic is genuinely imperative (stateful
scanning, library calls). ``analyze``-less static-schema form keeps plans
stable.

Reference parity: the reference's attachment/EML exporters iterate one
message into many output artifacts (cmd export paths); this is that shape
as a relational operator.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

_SENT_RE = re.compile(r"(?<=[.!?])\s+")


@udtf(returnType="sent_idx: int, sentence: string, n_words: int")
class SentenceSplit:
    """Split a document into trimmed sentences with order + word counts.
    Imperative variant — the `analyze`-free static schema keeps Catalyst's
    view of the plan fixed."""

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        for i, raw in enumerate(_SENT_RE.split(text)):
            s = raw.strip()
            if s:
                yield i, s, len(s.split())


def sentence_split_expr(text: Column) -> Column:
    """JVM twin of SentenceSplit: array of (sent_idx, sentence, n_words)
    structs via split/transform — zero Python. Posexplode it for the same
    rows the UDTF yields. Prefer this path; it exists to prove the UDTF is
    a convenience, not a necessity."""
    parts = F.split(text, r"(?<=[.!?])\s+")
    trimmed = F.transform(parts, lambda s: F.trim(s))
    return F.filter(trimmed, lambda s: s != "")
