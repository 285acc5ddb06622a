"""Deterministic global shuffle + shard assignment — the last step of a
training-data pipeline: dataloaders want the corpus split into N shards
with documents in a random-but-REPRODUCIBLE order (so a resumed or
re-run job reads byte-identical shards, and no shard correlates with
source/time/quality).

Spark-first shape: `rand()` cannot give that (seed-stable only per
partitioning); instead both the shard id and the within-shard position
derive from the deterministic rowhash (operators/sampling.py) — shard =
hash mod N, position = re-hashed key order. One exchange on shard id,
one within-partition sort: exactly the cost floor for any global
shuffle. Re-hashing for position (golden-ratio step applied twice)
decorrelates position from the shard assignment, so within a shard the
source order is scrambled too.

At 100 TB: N_shards sized to the target file size; the exchange is
hash-balanced by construction (shard = uniform hash mod N), so no skew
handling is needed — every shard gets |corpus|/N ± binomial noise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from msgvault_spark.operators.sampling import _A, _M, rowhash


def shuffle_position(key: Column | str) -> Column:
    """Second-round hash (hash of the hash) — the within-shard sort key.
    SQL twin: ``((rowhash(key) * 1327217885) % 2147483647)``."""
    return F.pmod(rowhash(key) * F.lit(_A), F.lit(_M))


def global_shuffle_shards(
    df: DataFrame,
    key: Column | str,
    n_shards: int,
) -> DataFrame:
    """Adds ``shard`` (0..n_shards-1) and ``pos`` (0-based within-shard
    rank in shuffled order). Deterministic in the KEY alone: reruns,
    different input partitionings, and the oracle all agree on every
    row's (shard, pos). One exchange + one sort."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    k = F.col(key) if isinstance(key, str) else key
    with_shard = df.withColumn(
        "shard", F.pmod(rowhash(k), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(
        shuffle_position(k).asc(), k.asc()
    )
    return with_shard.withColumn(
        "pos", (F.row_number().over(w) - 1).cast("long")
    )
