"""Array-literal construction that doesn't melt the driver.

``F.lit([...])`` converts the Python list element-by-element over Py4J:
a 128-dim vector costs >500 driver round-trips (~0.3s) EVERY time a plan
is built — the dominant term of cold plan construction for every vector
query. Rendering the same literal as ONE SQL expression string
(``array(0.1D, ...)``) is 3 round-trips total; Spark's lexer parses the
repr() shortest-round-trip form back to the identical IEEE-754 value
(verified bit-exact in tests/test_search_fts_knn.py), so results are
unchanged.

Scale note: this is driver-side plan-construction cost only — it doesn't
change the executed plan, which embeds the same literal either way.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_double_array(values: Iterable[float]) -> Column:
    """Literal array<double> as one parsed SQL expression — bit-exact
    (repr round-trip) and O(1) Py4J round-trips instead of O(dim)."""
    vals = [float(x) for x in values]
    if not vals:
        return F.expr("CAST(array() AS array<double>)")
    for v in vals:
        if not math.isfinite(v):
            # repr('inf'/'nan') doesn't lex as a SQL double; fall back to
            # the element-wise path for these (never hit by embeddings)
            return F.lit(vals)
    return F.expr("array(" + ",".join(f"{v!r}D" for v in vals) + ")")


def lit_long_array(values: Iterable[int]) -> Column:
    """Literal array<bigint> as one parsed SQL expression."""
    vals = [int(x) for x in values]
    if not vals:
        return F.expr("CAST(array() AS array<bigint>)")
    return F.expr("array(" + ",".join(f"{v}L" for v in vals) + ")")
