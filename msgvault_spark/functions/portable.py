"""Engine-portable hashing primitives shared by Spark plans and their
DuckDB oracle twins.

xxhash64/murmur are implementation-private to each engine; md5 is the one
hash both evaluate identically (the dedup/minhash.py insight). The
to-integer form here — first 6 md5 hex digits parsed base-16 — is the
single source of truth for every operator that buckets or orders by a
portable hash (DSIR feature buckets, length-bucket batch assignment);
change it HERE and in MD5_HEX6_SQL together or the engines silently
diverge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: DuckDB twin of md5_hex6_long; format with the SQL expression to hash.
MD5_HEX6_SQL = "('0x' || substr(md5({x}), 1, 6))::BIGINT"


def md5_hex6_long(col: Column) -> Column:
    """First 6 md5 hex digits as a non-negative long (< 2^24) — plain %
    on it matches DuckDB's MD5_HEX6_SQL % K exactly."""
    return F.conv(F.substring(F.md5(col), 1, 6), 16, 10).cast("long")
